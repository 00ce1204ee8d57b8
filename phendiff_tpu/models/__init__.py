from phendiff_tpu.models.config import PRESETS, UNet2DConfig  # noqa: F401
from phendiff_tpu.models.embeddings import (  # noqa: F401
    ClassEmbedding,
    pad_to_clip_sequence,
    sinusoidal_timestep_embedding,
)
from phendiff_tpu.models.unet2d import CondUNet2D  # noqa: F401
