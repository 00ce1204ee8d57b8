from phendiff_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from phendiff_tpu.parallel.tp import (  # noqa: F401
    shard_params,
    shard_train_state,
    tp_shardings,
    tp_spec,
)
from phendiff_tpu.parallel.pp import (  # noqa: F401
    PipelinedSDUNet,
    stage_devices,
    stage_keys,
)
