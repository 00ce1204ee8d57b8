from phendiff_tpu.ops.attention import attention_xla, multi_head_attention  # noqa: F401
from phendiff_tpu.ops.group_norm import group_norm  # noqa: F401
