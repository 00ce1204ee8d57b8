from phendiff_tpu.metrics.fidelity import (  # noqa: F401
    FeatureCache,
    MetricsConfig,
    calculate_metrics,
    fid_from_features,
    isc_from_logits,
    kid_from_features,
)
from phendiff_tpu.metrics.inception import InceptionExtractor, InceptionV3  # noqa: F401
