from phendiff_tpu.train.checkpoints import CheckpointManager  # noqa: F401
from phendiff_tpu.train.ema import EMAConfig, ema_decay, ema_update  # noqa: F401
from phendiff_tpu.train.eval_loop import EvalConfig, Evaluator  # noqa: F401
from phendiff_tpu.train.train_loop import (  # noqa: F401
    OptimizerConfig,
    TrainConfig,
    TrainState,
    diffusion_loss,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)
from phendiff_tpu.train.trainer import (  # noqa: F401
    RunPaths,
    Trainer,
    TrainerConfig,
    for_ddim_pipeline,
    for_sd_pipeline,
)
