"""Pure-JAX DDIM noise schedule: tables + step functions.

Reference behavior being rebuilt (see /root/reference):

* ``models_configs/noise_scheduler/*.json`` — diffusers ``DDIMScheduler``
  configs (scaled_linear betas, epsilon/v prediction, clip_sample,
  zero-SNR rescale, leading/trailing spacing, steps_offset).
* ``src/pipeline_conditional_ddim/pipeline_conditionial_ddim.py:340-347`` —
  eta-parameterized DDIM/DDPM step.
* ``src/utils_Img2Img.py:763-800`` — DDIM inversion hot loop
  (``DDIMInverseScheduler``).
* ``src/utils_training.py:256,414-433`` — ``add_noise`` forward diffusion and
  the epsilon / SNR-weighted-sample / velocity training targets.

Design (TPU-first, NOT a port):

* All state is two precomputed tables (``alphas_cumprod``, plus the final
  alpha) carried in a ``flax.struct`` pytree, so schedules pass freely
  through ``jit`` / ``scan`` / ``grad``.
* ``ddim_step`` takes the *pair* ``(t, t_prev)`` explicitly instead of
  deriving the previous timestep from mutable scheduler state.  A sampler is
  then literally ``lax.scan`` over an array of timestep pairs, and the
  inverse direction is the same function with the pair roles swapped —
  guaranteeing the inversion→regeneration round-trip property by
  construction (the "reco-err parity" north star).
* Timesteps may be scalars or per-sample ``[B]`` arrays (per-sample
  timesteps are how training draws uniform t per example).
* Tables are built in float64 on host then cast, matching the numerical
  conventions of the reference stack.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

Array = jax.Array

PREDICTION_TYPES = ("epsilon", "sample", "v_prediction")
BETA_SCHEDULES = ("linear", "scaled_linear", "squaredcos_cap_v2")
TIMESTEP_SPACINGS = ("leading", "trailing", "linspace")


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """Static scheduler configuration (hashable → usable as a jit static arg).

    Field names follow the diffusers JSON config format so the reference's
    ``models_configs/noise_scheduler/*.json`` files load unchanged
    (serialization interop only; the math below is original).
    """

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    prediction_type: str = "epsilon"
    clip_sample: bool = True
    clip_sample_range: float = 1.0
    set_alpha_to_one: bool = True
    steps_offset: int = 0
    thresholding: bool = False
    dynamic_thresholding_ratio: float = 0.995
    sample_max_value: float = 1.0
    timestep_spacing: str = "leading"
    rescale_betas_zero_snr: bool = False

    def __post_init__(self):
        if self.beta_schedule not in BETA_SCHEDULES:
            raise ValueError(f"unknown beta_schedule: {self.beta_schedule}")
        if self.prediction_type not in PREDICTION_TYPES:
            raise ValueError(f"unknown prediction_type: {self.prediction_type}")
        if self.timestep_spacing not in TIMESTEP_SPACINGS:
            raise ValueError(f"unknown timestep_spacing: {self.timestep_spacing}")

    # -- diffusers-format JSON interop ------------------------------------
    _JSON_IGNORED = (
        "_class_name",
        "_diffusers_version",
        "trained_betas",
        "skip_prk_steps",
    )

    @classmethod
    def from_json(cls, path_or_dict) -> "SchedulerConfig":
        if isinstance(path_or_dict, dict):
            raw = dict(path_or_dict)
        else:
            with open(path_or_dict) as f:
                raw = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in raw.items() if k in known}
        dropped = {
            k for k in raw if k not in known and k not in cls._JSON_IGNORED
        }
        if dropped:
            raise ValueError(f"unsupported scheduler config keys: {sorted(dropped)}")
        return cls(**kwargs)

    def to_json_dict(self) -> dict:
        d = dataclasses.asdict(self)
        d["_class_name"] = "DDIMScheduler"
        return d

    def replace(self, **kw) -> "SchedulerConfig":
        return dataclasses.replace(self, **kw)


def _make_betas(config: SchedulerConfig) -> np.ndarray:
    T = config.num_train_timesteps
    if config.beta_schedule == "linear":
        betas = np.linspace(config.beta_start, config.beta_end, T, dtype=np.float64)
    elif config.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(config.beta_start**0.5, config.beta_end**0.5, T, dtype=np.float64)
            ** 2
        )
    elif config.beta_schedule == "squaredcos_cap_v2":
        # alpha_bar(t) = cos^2((t/T + 0.008) / 1.008 * pi/2), beta capped at .999
        def alpha_bar(t_frac):
            return np.cos((t_frac + 0.008) / 1.008 * np.pi / 2) ** 2

        i = np.arange(T, dtype=np.float64)
        betas = np.minimum(1.0 - alpha_bar((i + 1) / T) / alpha_bar(i / T), 0.999)
    else:  # pragma: no cover - guarded in __post_init__
        raise ValueError(config.beta_schedule)
    return betas


def _rescale_zero_terminal_snr(alphas_cumprod: np.ndarray) -> np.ndarray:
    """Shift/scale sqrt(alpha_bar) so the terminal SNR is exactly zero.

    Technique from "Common Diffusion Noise Schedules and Sample Steps are
    Flawed" (Lin et al., 2023), enabled by the reference configs'
    ``rescale_betas_zero_snr`` flag.
    """
    s = np.sqrt(alphas_cumprod)
    s0, sT = s[0], s[-1]
    s = s - sT
    s = s * (s0 / (s0 - sT))
    return s**2


@struct.dataclass
class NoiseSchedule:
    """Precomputed diffusion tables. A pytree; ``config`` is static metadata."""

    alphas_cumprod: Array  # [T] float32, cumulative alpha products
    final_alpha_cumprod: Array  # scalar: alpha_bar for "t = -1" (end of sampling)
    config: SchedulerConfig = struct.field(pytree_node=False)

    @property
    def num_train_timesteps(self) -> int:
        return self.config.num_train_timesteps


def make_schedule(config: SchedulerConfig, dtype=jnp.float32) -> NoiseSchedule:
    betas = _make_betas(config)
    alphas_cumprod = np.cumprod(1.0 - betas)
    if config.rescale_betas_zero_snr:
        alphas_cumprod = _rescale_zero_terminal_snr(alphas_cumprod)
    final = 1.0 if config.set_alpha_to_one else float(alphas_cumprod[0])
    return NoiseSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        final_alpha_cumprod=jnp.asarray(final, dtype=dtype),
        config=config,
    )


# ---------------------------------------------------------------------------
# Timestep schedules (host-side, static — shapes must be known to jit)
# ---------------------------------------------------------------------------


def inference_timesteps(config: SchedulerConfig, num_inference_steps: int) -> np.ndarray:
    """Descending sampling timesteps, matching the reference's spacing options.

    leading:  round(arange(n) * T//n)[::-1] + steps_offset
    trailing: round(arange(T, 0, -T/n)) - 1      (descending)
    linspace: round(linspace(0, T-1, n))[::-1]
    """
    T = config.num_train_timesteps
    if num_inference_steps > T:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) > num_train_timesteps ({T})"
        )
    if config.timestep_spacing == "leading":
        step_ratio = T // num_inference_steps
        ts = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1]
        ts = ts + config.steps_offset
    elif config.timestep_spacing == "trailing":
        step_ratio = T / num_inference_steps
        ts = np.round(np.arange(T, 0, -step_ratio)) - 1
    else:  # linspace
        ts = np.linspace(0, T - 1, num_inference_steps).round()[::-1]
    return ts.astype(np.int64)


def timestep_pairs(
    config: SchedulerConfig,
    num_inference_steps: int,
    frac_diffusion_skipped: float = 0.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(t, t_prev) pairs for a generation scan, most-noised first.

    ``frac_diffusion_skipped`` reproduces the reference's partial-trajectory
    option (``pipeline_conditionial_ddim.py:250-260``): keep only timesteps
    ``<= T * (1 - frac)``.  ``t_prev`` of the last pair is ``-1``, which the
    step functions map to ``final_alpha_cumprod``.
    """
    ts = inference_timesteps(config, num_inference_steps)
    if frac_diffusion_skipped:
        if not 0.0 <= frac_diffusion_skipped <= 1.0:
            raise ValueError("frac_diffusion_skipped must be in [0, 1]")
        keep = ts <= config.num_train_timesteps * (1.0 - frac_diffusion_skipped)
        ts = ts[keep]
    if len(ts) == 0:
        raise ValueError("no timesteps left after frac_diffusion_skipped filtering")
    t_prev = np.concatenate([ts[1:], np.array([-1], dtype=ts.dtype)])
    return ts, t_prev


def inversion_timestep_pairs(
    config: SchedulerConfig, num_inference_steps: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(t, t_next) pairs for an inversion scan — exactly the reverse of the
    generation pairs, so invert→regenerate round-trips by construction.

    The model is evaluated at ``t`` (the *lower* timestep; first pair has
    ``t = -1`` meaning "clean image, alpha_bar = final_alpha_cumprod"), and
    the state is pushed up to ``t_next``.  This mirrors the role of
    ``DDIMInverseScheduler`` in the reference's ``_inversion`` hot loop
    (``utils_Img2Img.py:782-798``) with self-consistent pairing.
    """
    ts, t_prev = timestep_pairs(config, num_inference_steps)
    return t_prev[::-1].copy(), ts[::-1].copy()


# ---------------------------------------------------------------------------
# Pointwise table lookups
# ---------------------------------------------------------------------------


def _gather_alpha(schedule: NoiseSchedule, t: Array) -> Array:
    """alpha_bar at integer timestep(s) t; t == -1 → final_alpha_cumprod."""
    t = jnp.asarray(t)
    safe_t = jnp.clip(t, 0, schedule.num_train_timesteps - 1)
    alpha = schedule.alphas_cumprod[safe_t]
    return jnp.where(t < 0, schedule.final_alpha_cumprod, alpha)


def _bcast_to_sample(coef: Array, sample: Array) -> Array:
    """Broadcast a scalar-or-[B] coefficient over sample's trailing dims."""
    coef = jnp.asarray(coef)
    if coef.ndim == 0:
        return coef
    return coef.reshape(coef.shape + (1,) * (sample.ndim - coef.ndim))


# ---------------------------------------------------------------------------
# Forward diffusion & training targets
# ---------------------------------------------------------------------------


def add_noise(schedule: NoiseSchedule, x0: Array, noise: Array, t: Array) -> Array:
    """q(x_t | x_0): sqrt(a_t) x0 + sqrt(1-a_t) eps  (utils_training.py:256)."""
    a = _gather_alpha(schedule, t).astype(x0.dtype)
    sqrt_a = _bcast_to_sample(jnp.sqrt(a), x0)
    sqrt_1ma = _bcast_to_sample(jnp.sqrt(1.0 - a), x0)
    return sqrt_a * x0 + sqrt_1ma * noise


def velocity(schedule: NoiseSchedule, x0: Array, noise: Array, t: Array) -> Array:
    """v-prediction target: sqrt(a) eps - sqrt(1-a) x0 (Salimans & Ho 2022)."""
    a = _gather_alpha(schedule, t).astype(x0.dtype)
    sqrt_a = _bcast_to_sample(jnp.sqrt(a), x0)
    sqrt_1ma = _bcast_to_sample(jnp.sqrt(1.0 - a), x0)
    return sqrt_a * noise - sqrt_1ma * x0


def snr(schedule: NoiseSchedule, t: Array) -> Array:
    """Signal-to-noise ratio alpha_bar / (1 - alpha_bar) — the reference's
    'sample' loss weighting (utils_training.py:420-426)."""
    a = _gather_alpha(schedule, t)
    return a / (1.0 - a)


# ---------------------------------------------------------------------------
# Model-output → (x0, eps) conversion
# ---------------------------------------------------------------------------


def predict_x0_eps(
    schedule: NoiseSchedule,
    model_output: Array,
    t: Array,
    sample: Array,
    prediction_type: Optional[str] = None,
) -> Tuple[Array, Array]:
    """Convert the network output into (pred_x0, pred_eps) at timestep t."""
    pt = prediction_type or schedule.config.prediction_type
    a = _gather_alpha(schedule, t).astype(sample.dtype)
    sqrt_a = _bcast_to_sample(jnp.sqrt(a), sample)
    sqrt_1ma = _bcast_to_sample(jnp.sqrt(1.0 - a), sample)
    if pt == "epsilon":
        x0 = (sample - sqrt_1ma * model_output) / sqrt_a
        eps = model_output
    elif pt == "sample":
        x0 = model_output
        eps = (sample - sqrt_a * x0) / sqrt_1ma
    elif pt == "v_prediction":
        x0 = sqrt_a * sample - sqrt_1ma * model_output
        eps = sqrt_a * model_output + sqrt_1ma * sample
    else:
        raise ValueError(f"unknown prediction_type: {pt}")
    return x0, eps


def _threshold_sample(x0: Array, ratio: float, max_value: float) -> Array:
    """Imagen-style dynamic thresholding over each sample's flattened pixels."""
    b = x0.shape[0]
    flat = jnp.abs(x0.reshape(b, -1)).astype(jnp.float32)
    s = jnp.quantile(flat, ratio, axis=1)
    s = jnp.clip(s, 1.0, max_value)
    s = s.reshape((b,) + (1,) * (x0.ndim - 1)).astype(x0.dtype)
    return jnp.clip(x0, -s, s) / s


def _maybe_clip_x0(schedule: NoiseSchedule, x0: Array) -> Array:
    cfg = schedule.config
    if cfg.thresholding:
        return _threshold_sample(
            x0, cfg.dynamic_thresholding_ratio, cfg.sample_max_value
        )
    if cfg.clip_sample:
        return jnp.clip(x0, -cfg.clip_sample_range, cfg.clip_sample_range)
    return x0


# ---------------------------------------------------------------------------
# DDIM sampling / inversion steps (pure, scan-ready)
# ---------------------------------------------------------------------------


def ddim_step(
    schedule: NoiseSchedule,
    model_output: Array,
    t: Array,
    t_prev: Array,
    sample: Array,
    *,
    eta: float = 0.0,
    noise: Optional[Array] = None,
    use_clipped_model_output: bool = False,
) -> Array:
    """One reverse-diffusion step x_t → x_{t_prev}  (DDIM eq. 12).

    x_{prev} = sqrt(a_prev) x0 + sqrt(1 - a_prev - sigma^2) eps + sigma z,
    sigma^2 = eta^2 * (1-a_prev)/(1-a_t) * (1 - a_t/a_prev).

    Mirrors the semantics of the reference's ``scheduler.step`` call at
    ``pipeline_conditionial_ddim.py:340-347`` (eta, clipping,
    use_clipped_model_output) as a pure function of the (t, t_prev) pair.
    """
    x0, eps = predict_x0_eps(schedule, model_output, t, sample)
    x0 = _maybe_clip_x0(schedule, x0)

    a_t = _gather_alpha(schedule, t).astype(sample.dtype)
    a_prev = _gather_alpha(schedule, t_prev).astype(sample.dtype)

    if use_clipped_model_output:
        # Re-derive eps from the clipped x0 so the step is self-consistent.
        sqrt_a = _bcast_to_sample(jnp.sqrt(a_t), sample)
        sqrt_1ma = _bcast_to_sample(jnp.sqrt(1.0 - a_t), sample)
        eps = (sample - sqrt_a * x0) / sqrt_1ma

    variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
    std = eta * jnp.sqrt(jnp.maximum(variance, 0.0))

    sqrt_a_prev = _bcast_to_sample(jnp.sqrt(a_prev), sample)
    dir_coef = _bcast_to_sample(
        jnp.sqrt(jnp.maximum(1.0 - a_prev - std**2, 0.0)), sample
    )
    prev = sqrt_a_prev * x0 + dir_coef * eps
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires `noise`")
        prev = prev + _bcast_to_sample(std, sample) * noise
    return prev


def ddim_inverse_step(
    schedule: NoiseSchedule,
    model_output: Array,
    t: Array,
    t_next: Array,
    sample: Array,
) -> Array:
    """One forward-ODE step x_t → x_{t_next} (t_next > t), for inversion.

    The exact mirror of ``ddim_step`` with eta=0 and the pair roles swapped;
    NO x0 clipping (clipping breaks invertibility — the reference's inverse
    scheduler likewise has clip_sample disabled in its hot loop,
    ``utils_Img2Img.py:776-798``).
    """
    x0, eps = predict_x0_eps(schedule, model_output, t, sample)
    a_next = _gather_alpha(schedule, t_next).astype(sample.dtype)
    sqrt_a_next = _bcast_to_sample(jnp.sqrt(a_next), sample)
    sqrt_1ma_next = _bcast_to_sample(jnp.sqrt(1.0 - a_next), sample)
    return sqrt_a_next * x0 + sqrt_1ma_next * eps
