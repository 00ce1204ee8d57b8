from phendiff_tpu.obs.images import (  # noqa: F401
    image_grid,
    latents_to_grayscale,
    side_by_side,
    to_pil,
)
from phendiff_tpu.obs.logging_utils import setup_logger  # noqa: F401
from phendiff_tpu.obs.profiling import StepTimer, annotate, trace_if  # noqa: F401
from phendiff_tpu.obs.trackers import (  # noqa: F401
    JSONLTracker,
    NullTracker,
    Tracker,
    WandbTracker,
    make_tracker,
)
