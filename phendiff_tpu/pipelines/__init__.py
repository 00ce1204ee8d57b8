from phendiff_tpu.pipelines.conditional_ddim import (  # noqa: F401
    DEFAULT_NUM_INFERENCE_STEPS,
    GuidanceConfig,
    ddim_invert,
    ddim_sample,
    to_images,
)
from phendiff_tpu.pipelines.ddim_pipeline import ConditionalDDIMPipeline  # noqa: F401
