from phendiff_tpu.core.scheduler import (  # noqa: F401
    NoiseSchedule,
    SchedulerConfig,
    add_noise,
    ddim_inverse_step,
    ddim_step,
    inference_timesteps,
    inversion_timestep_pairs,
    make_schedule,
    predict_x0_eps,
    snr,
    timestep_pairs,
    velocity,
)
from phendiff_tpu.core.precision import Policy  # noqa: F401
