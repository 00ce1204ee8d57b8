from phendiff_tpu.serving.engine import InferenceEngine, EngineConfig  # noqa: F401
