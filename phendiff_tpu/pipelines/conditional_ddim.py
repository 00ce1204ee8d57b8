"""Class-conditional DDIM sampling & inversion as jit-compiled scans.

Capability parity with the reference's ``ConditionalDDIMPipeline.__call__``
(``src/pipeline_conditional_ddim/pipeline_conditionial_ddim.py:139-361``)
and ``_inversion`` (``src/utils_Img2Img.py:763-800``):

* start from pure noise or a given image; optional forward-noising of the
  start image to the first kept timestep;
* partial trajectories via ``frac_diffusion_skipped``;
* classifier-free guidance with BOTH reference equations —
  Imagen ``uncond + w (cond - uncond)`` (active iff w > 1) and original CFG
  ``cond + w (cond - uncond)`` (active iff w > 0) — including per-sample
  tensor ``w``;
* eta-parameterized DDIM→DDPM interpolation;
* deterministic inversion with the source class.

TPU-first differences from the reference:

* the denoise loop is a single ``lax.scan`` over precomputed (t, t_prev)
  pairs — one compiled program, no per-step Python dispatch;
* the CFG cond/uncond passes run as ONE batched forward (batch 2B) instead
  of the reference's two sequential unbatched forwards (the TODO at
  ``pipeline_conditionial_ddim.py:287`` acknowledges this cost);
* the unconditional branch feeds a zeros class embedding through the
  ``class_emb`` input, exactly as the reference does (``:310-317``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.core import scheduler as S

Array = jax.Array

# denoiser(x[B,H,W,C], t[B], class_emb[B,D]) -> model_output[B,H,W,C]
DenoiserFn = Callable[[Array, Array, Array], Array]

DEFAULT_NUM_INFERENCE_STEPS = 50  # reference: pipeline_conditionial_ddim.py:24


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """CFG configuration. ``guidance_factor`` may be a python scalar (static)
    or a per-sample array (always applies guidance elementwise)."""

    guidance_factor: Union[float, Array] = 0.0
    equation: str = "imagen"  # "imagen" | "cfg"

    def __post_init__(self):
        if self.equation not in ("imagen", "cfg"):
            raise ValueError(f"unknown guidance equation: {self.equation}")

    @property
    def active(self) -> bool:
        w = self.guidance_factor
        if isinstance(w, (int, float)):
            return (w > 1.0) if self.equation == "imagen" else (w > 0.0)
        return True  # tensor w: always guided (reference :272-284)

    def combine(self, cond: Array, uncond: Array) -> Array:
        w = self.guidance_factor
        if not isinstance(w, (int, float)):
            w = jnp.asarray(w).reshape((-1,) + (1,) * (cond.ndim - 1))
        if self.equation == "imagen":
            return uncond + w * (cond - uncond)
        return cond + w * (cond - uncond)


def truncate_pairs_by_strength(ts, t_prev, strength: float):
    """Keep only the last ``int(strength * n)`` steps — SD ``strength``
    semantics (reference ``get_timesteps``,
    custom_pipeline_stable_diffusion_img2img.py:375-382): truncation by
    *count*, unlike ``frac_diffusion_skipped`` which filters by timestep
    value."""
    if not 0.0 <= strength <= 1.0:
        raise ValueError("strength must be in [0, 1]")
    n = len(ts)
    init_timestep = min(int(n * strength), n)
    if init_timestep == 0:
        raise ValueError("strength too small: no denoising steps left")
    start = max(n - init_timestep, 0)
    return ts[start:], t_prev[start:]


def _scan_pairs(ts: np.ndarray, t_prev: np.ndarray) -> Array:
    return jnp.stack(
        [jnp.asarray(ts, dtype=jnp.int32), jnp.asarray(t_prev, dtype=jnp.int32)],
        axis=1,
    )


def ddim_sample(
    denoiser: DenoiserFn,
    schedule: S.NoiseSchedule,
    class_emb: Array,  # [B, D] conditioning embeddings (rows of the table)
    *,
    shape: Optional[tuple] = None,
    rng: Optional[Array] = None,
    start_image: Optional[Array] = None,
    add_forward_noise: bool = False,
    num_inference_steps: int = DEFAULT_NUM_INFERENCE_STEPS,
    frac_diffusion_skipped: float = 0.0,
    strength: Optional[float] = None,
    guidance: GuidanceConfig = GuidanceConfig(),
    eta: float = 0.0,
    uncond_emb: Optional[Array] = None,
) -> Array:
    """Run the conditional DDIM sampler; returns samples in [-1, 1].

    Exactly one of (``shape`` + ``rng``) or ``start_image`` selects the
    initial state (reference ``:237-245``).  ``add_forward_noise`` noises the
    start image to the first kept timestep (reference ``:263-269``).
    """
    # input validation (reference check_inputs, pipeline_conditionial_ddim.py:91-137)
    if num_inference_steps < 1:
        raise ValueError("num_inference_steps must be >= 1")
    if num_inference_steps > schedule.num_train_timesteps:
        raise ValueError(
            f"num_inference_steps ({num_inference_steps}) exceeds "
            f"num_train_timesteps ({schedule.num_train_timesteps})"
        )
    if start_image is not None and shape is not None and tuple(start_image.shape) != tuple(shape):
        raise ValueError(
            f"start_image shape {start_image.shape} != requested shape {shape}"
        )
    if class_emb.ndim < 2:
        raise ValueError("class_emb must be [B, ...] conditioning per sample")
    if start_image is not None and start_image.shape[0] != class_emb.shape[0]:
        raise ValueError("start_image batch != conditioning batch")
    if frac_diffusion_skipped and strength is not None:
        raise ValueError("use either frac_diffusion_skipped or strength, not both")

    if start_image is None:
        if shape is None or rng is None:
            raise ValueError("need shape+rng when no start_image is given")
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = start_image.astype(jnp.float32)

    ts, t_prev = S.timestep_pairs(
        schedule.config, num_inference_steps, frac_diffusion_skipped
    )
    if strength is not None:
        ts, t_prev = truncate_pairs_by_strength(ts, t_prev, strength)

    if add_forward_noise:
        if rng is None:
            raise ValueError("add_forward_noise requires rng")
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        x = S.add_noise(schedule, x, noise, jnp.asarray(ts[0]))

    do_cfg = guidance.active
    if do_cfg and uncond_emb is None:
        uncond_emb = jnp.zeros_like(class_emb)

    pairs = _scan_pairs(ts, t_prev)
    b = x.shape[0]
    need_noise = eta > 0.0
    if need_noise and rng is None:
        raise ValueError("eta > 0 requires rng")
    step_keys = (
        jax.random.split(rng, pairs.shape[0]) if need_noise else jnp.zeros((pairs.shape[0], 2), dtype=jnp.uint32)
    )

    def body(x, inp):
        pair, key = inp
        t = jnp.broadcast_to(pair[0], (b,))
        if do_cfg:
            # one batched forward: [cond; uncond]
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            emb2 = jnp.concatenate([class_emb, uncond_emb], axis=0)
            out2 = denoiser(x2, t2, emb2)
            cond, uncond = jnp.split(out2, 2, axis=0)
            model_out = guidance.combine(cond, uncond)
        else:
            model_out = denoiser(x, t, class_emb)
        noise = (
            jax.random.normal(key, x.shape, dtype=x.dtype) if need_noise else None
        )
        x = S.ddim_step(
            schedule, model_out, pair[0], pair[1], x, eta=eta, noise=noise
        )
        return x, None

    x, _ = jax.lax.scan(body, x, (pairs, step_keys))
    return x


# Module-level jitted per-step updates so the cache survives across
# stepwise-sampler calls: CFG combine + DDIM step in ONE program
# (NoiseSchedule is a pytree with static config, so it passes through jit).
@functools.partial(jax.jit, static_argnums=(5,))
def _stepwise_cfg_update(schedule, cond, uncond, x, pair, equation, w):
    w = jnp.asarray(w, jnp.float32)
    if w.ndim > 0:  # per-sample tensor w (reference :272-284)
        w = w.reshape((-1,) + (1,) * (cond.ndim - 1))
    if equation == "imagen":
        model_out = uncond + w * (cond - uncond)
    else:
        model_out = cond + w * (cond - uncond)
    return S.ddim_step(schedule, model_out, pair[0], pair[1], x)


_stepwise_plain_update = jax.jit(
    lambda schedule, model_out, x, pair: S.ddim_step(
        schedule, model_out, pair[0], pair[1], x
    )
)


def ddim_sample_stepwise(
    denoiser: DenoiserFn,
    schedule: S.NoiseSchedule,
    class_emb: Array,
    *,
    shape: Optional[tuple] = None,
    rng: Optional[Array] = None,
    start_image: Optional[Array] = None,
    add_forward_noise: bool = False,
    num_inference_steps: int = DEFAULT_NUM_INFERENCE_STEPS,
    frac_diffusion_skipped: float = 0.0,
    strength: Optional[float] = None,
    guidance: GuidanceConfig = GuidanceConfig(),
    uncond_emb: Optional[Array] = None,
) -> Array:
    """``ddim_sample`` semantics (same rng discipline, batched cond+uncond
    CFG forward, both guidance equations; eta=0 only) as a HOST-DRIVEN
    step loop — one denoiser call chain per step instead of one
    ``lax.scan``.  For denoisers that cannot live inside a scan body,
    e.g. the full-width segmented SD UNet whose monolithic HLO exceeds
    constrained compile transports (``models/sd_segmented.py``).  Dispatch
    runs ahead of execution, so the device pipeline stays busy; only the
    cross-step fusion of the scan is lost.  Trajectories match
    ``ddim_sample`` exactly for the same arguments
    (tests/test_segmented_trainer.py)."""
    if num_inference_steps < 1:
        raise ValueError("num_inference_steps must be >= 1")
    if start_image is None:
        if shape is None or rng is None:
            raise ValueError("need shape+rng when no start_image is given")
        rng, sub = jax.random.split(rng)
        x = jax.random.normal(sub, shape, dtype=jnp.float32)
    else:
        x = start_image.astype(jnp.float32)

    ts, t_prev = S.timestep_pairs(
        schedule.config, num_inference_steps, frac_diffusion_skipped
    )
    if strength is not None:
        ts, t_prev = truncate_pairs_by_strength(ts, t_prev, strength)

    if add_forward_noise:
        if rng is None:
            raise ValueError("add_forward_noise requires rng")
        rng, sub = jax.random.split(rng)
        noise = jax.random.normal(sub, x.shape, dtype=x.dtype)
        x = S.add_noise(schedule, x, noise, jnp.asarray(ts[0]))

    do_cfg = guidance.active
    if do_cfg and uncond_emb is None:
        uncond_emb = jnp.zeros_like(class_emb)

    b = x.shape[0]
    for te, tp in zip(ts, t_prev):
        pair = jnp.asarray([int(te), int(tp)], jnp.int32)
        t = jnp.broadcast_to(jnp.asarray(int(te), jnp.int32), (b,))
        if do_cfg:
            out2 = denoiser(
                jnp.concatenate([x, x], axis=0),
                jnp.concatenate([t, t], axis=0),
                jnp.concatenate([class_emb, uncond_emb], axis=0),
            )
            cond, uncond = jnp.split(out2, 2, axis=0)
            x = _stepwise_cfg_update(
                schedule, cond, uncond, x, pair, guidance.equation,
                guidance.guidance_factor,
            )
        else:
            x = _stepwise_plain_update(schedule, denoiser(x, t, class_emb), x, pair)
    return x


def ddim_invert(
    denoiser: DenoiserFn,
    schedule: S.NoiseSchedule,
    image: Array,  # [B, H, W, C] in [-1, 1]
    class_emb: Array,  # [B, D] — SOURCE class conditioning
    *,
    num_inference_steps: int = DEFAULT_NUM_INFERENCE_STEPS,
) -> Array:
    """Deterministic DDIM inversion (image → Gaussian-ish latent).

    The reference's ``_inversion`` hot loop (``utils_Img2Img.py:782-798``)
    as a scan over ascending (t, t_next) pairs; always unguided (w=0), as in
    the DDIB transfer method."""
    ts, t_next = S.inversion_timestep_pairs(schedule.config, num_inference_steps)
    pairs = _scan_pairs(ts, t_next)
    b = image.shape[0]
    x = image.astype(jnp.float32)

    def body(x, pair):
        # network eval time clamped to >= 0: the first pair's t=-1 means
        # "clean image" in the alpha tables, but the net never saw t=-1
        t = jnp.broadcast_to(jnp.maximum(pair[0], 0), (b,))
        model_out = denoiser(x, t, class_emb)
        x = S.ddim_inverse_step(schedule, model_out, pair[0], pair[1], x)
        return x, None

    x, _ = jax.lax.scan(body, x, pairs)
    return x


def to_images(x: Array) -> Array:
    """[-1,1] model space → [0,1] image space (reference ``:349-352``)."""
    return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)
