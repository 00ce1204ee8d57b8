from phendiff_tpu.experiments.comparison import (  # noqa: F401
    ComparisonConfig,
    ComparisonExperiment,
    MethodParams,
)
