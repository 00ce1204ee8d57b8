"""Image-to-image class-transfer methods.

Capability parity with the reference's transfer engine
(``src/utils_Img2Img.py:273-800``), re-designed as jittable functions:

* ``ddib``                      — DDIM-invert with the source class, then
                                  regenerate with the target class (w=0,
                                  full trajectory; ``:566-612``).
* ``inverted_regeneration``     — ddib with target == source: the built-in
                                  reconstruction-error probe (``:374-384``).
* ``cfg_forward_start``         — partially forward-noise the image, then
                                  CFG-denoise toward the target class
                                  (``:615-648``; config defaults
                                  guidance 2.5, frac 0.5).
* ``guided_inverted_start``     — invert, then reconstruction-guided
                                  sampling: at each step take the gradient
                                  of an Lp distance between pred_x0 and the
                                  original image w.r.t. the latent and
                                  descend before the scheduler step
                                  (``_custom_guided_generation``,
                                  ``:701-760``; default scale 1e-3, p=2).

TPU-first notes: every method is a ``lax.scan``; the reconstruction-guided
method takes ``jax.grad`` of the Lp loss *through the UNet* inside the scan
body (the reference calls ``torch.autograd.grad`` per step) — wrap the
denoiser in ``jax.checkpoint`` upstream if memory-bound.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from phendiff_tpu.core import scheduler as S
from phendiff_tpu.pipelines import conditional_ddim as cd

Array = jax.Array

TRANSFER_METHODS = (
    "ddib",
    "inverted_regeneration",
    "classifier_free_guidance_forward_start",
    "linear_interp_custom_guidance_inverted_start",
)


def ddib(
    denoiser: cd.DenoiserFn,
    schedule: S.NoiseSchedule,
    images: Array,
    source_emb: Array,
    target_emb: Array,
    *,
    num_inference_steps: int = 100,
) -> Array:
    """Dual diffusion implicit bridge: x --invert(source)--> z --gen(target)--> x'.

    TPU-native fusion: with eta=0 the DDIM generation update and the
    inversion update are the *same* algebraic map
        x' = sqrt(a[t_tgt]) x0 + sqrt(1 - a[t_tgt]) eps,   (x0, eps) at t_eval
    differing only in the (t_eval, t_target) tables and the conditioning.
    The whole bridge is therefore ONE ``lax.scan`` over 2N steps with a
    per-step (pair, use_target_emb, apply_clip) table — a single UNet body
    in the compiled program (half the HLO / compile time of running two
    scans), zero per-step host dispatch.  x0-clipping (enabled by the
    scheduler config, as the reference's generation leg does) is masked off
    on the inversion leg where it would break invertibility.
    """
    inv_t, inv_next = S.inversion_timestep_pairs(schedule.config, num_inference_steps)
    gen_t, gen_prev = S.timestep_pairs(schedule.config, num_inference_steps)
    t_eval = jnp.asarray(np.concatenate([inv_t, gen_t]), dtype=jnp.int32)
    t_tgt = jnp.asarray(np.concatenate([inv_next, gen_prev]), dtype=jnp.int32)
    n = len(inv_t)
    is_gen = jnp.asarray(
        np.concatenate([np.zeros(n), np.ones(len(gen_t))]), dtype=jnp.float32
    )

    b = images.shape[0]
    x = images.astype(jnp.float32)

    def body(x, step):
        te, tt, gen_flag = step
        # conditioning: source on the inversion leg, target on generation
        emb = jnp.where(
            _bcast(gen_flag, target_emb), target_emb, source_emb
        )
        # network eval time clamped to >= 0 (the te=-1 "clean image" point
        # keeps its alpha-table semantics but the net never saw t=-1)
        t_net = jnp.maximum(te, 0)
        model_out = denoiser(x, jnp.broadcast_to(t_net, (b,)), emb)
        x0, eps = S.predict_x0_eps(schedule, model_out, te, x)
        x0_clipped = S._maybe_clip_x0(schedule, x0)
        x0 = jnp.where(_bcast(gen_flag, x0), x0_clipped, x0)
        a_tgt = S._gather_alpha(schedule, tt).astype(x.dtype)
        x = jnp.sqrt(a_tgt) * x0 + jnp.sqrt(1.0 - a_tgt) * eps
        return x, None

    x, _ = jax.lax.scan(body, x, (t_eval, t_tgt, is_gen))
    return x


def _bcast(flag: Array, like: Array) -> Array:
    return jnp.broadcast_to(flag.reshape((1,) * like.ndim), like.shape) > 0.5


def ddib_stepwise(
    denoiser: cd.DenoiserFn,
    schedule: S.NoiseSchedule,
    images: Array,
    source_emb: Array,
    target_emb: Array,
    *,
    num_inference_steps: int = 100,
) -> Array:
    """``ddib`` with a host-driven step loop instead of one ``lax.scan``.

    Numerically identical to ``ddib`` (same per-step map); use when the
    denoiser cannot live inside a scan body — e.g. the full-width SD-2.1
    UNet executed as segmented stage programs
    (``models/sd_segmented.SegmentedSDUNet``), whose monolithic HLO exceeds
    constrained compile transports.  Dispatch runs ahead of execution, so
    the device stays busy; only the cross-step fusion of the scan is lost.
    """
    inv_t, inv_next = S.inversion_timestep_pairs(schedule.config, num_inference_steps)
    gen_t, gen_prev = S.timestep_pairs(schedule.config, num_inference_steps)
    b = images.shape[0]

    x = images.astype(jnp.float32)
    for leg, (ts, tts, emb) in enumerate(
        [(inv_t, inv_next, source_emb), (gen_t, gen_prev, target_emb)]
    ):
        for te, tt in zip(ts, tts):
            out = denoiser(x, jnp.full((b,), max(int(te), 0), jnp.int32), emb)
            x = _ddib_update(
                schedule, x, out, jnp.asarray(int(te)), jnp.asarray(int(tt)),
                leg == 1,
            )
    return x


# Module-level so jax.jit's cache survives across ddib_stepwise calls (a
# per-call closure would re-trace the update on every transfer; NoiseSchedule
# is a pytree with static config, so it passes through jit directly).
@functools.partial(jax.jit, static_argnums=(5,))
def _ddib_update(schedule, x, model_out, te, tt, gen_flag: bool):
    x0, eps = S.predict_x0_eps(schedule, model_out, te, x)
    x0c = S._maybe_clip_x0(schedule, x0)
    x0 = jnp.where(gen_flag, x0c, x0)
    a_tgt = S._gather_alpha(schedule, tt).astype(x.dtype)
    return jnp.sqrt(a_tgt) * x0 + jnp.sqrt(1.0 - a_tgt) * eps


def inverted_regeneration(
    denoiser: cd.DenoiserFn,
    schedule: S.NoiseSchedule,
    images: Array,
    source_emb: Array,
    *,
    num_inference_steps: int = 100,
) -> Array:
    """Identity round trip (reconstruction-error probe)."""
    return ddib(
        denoiser, schedule, images, source_emb, source_emb,
        num_inference_steps=num_inference_steps,
    )


def cfg_forward_start(
    denoiser: cd.DenoiserFn,
    schedule: S.NoiseSchedule,
    images: Array,
    target_emb: Array,
    rng: Array,
    *,
    guidance_scale: float = 2.5,
    frac_diffusion_skipped: float = 0.5,
    num_inference_steps: int = 100,
    guidance_equation: str = "imagen",
) -> Array:
    """Partial forward noising + CFG regeneration toward the target class."""
    return cd.ddim_sample(
        denoiser, schedule, target_emb,
        start_image=images,
        add_forward_noise=True,
        rng=rng,
        num_inference_steps=num_inference_steps,
        frac_diffusion_skipped=frac_diffusion_skipped,
        guidance=cd.GuidanceConfig(guidance_scale, guidance_equation),
    )


def lp_loss(a: Array, b: Array, p: float = 2.0) -> Array:
    """Per-sample p-norm distances, shape [B] (reference ``Lp_loss``,
    utils_Img2Img.py:245-270)."""
    diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)) ** p
    return jnp.sum(diff.reshape(a.shape[0], -1), axis=1) ** (1.0 / p)


def custom_guided_generation(
    denoiser: cd.DenoiserFn,
    schedule: S.NoiseSchedule,
    start_latents: Array,
    target_emb: Array,
    *,
    guidance_loss_scale: float = 1e-3,
    p: float = 2.0,
    num_inference_steps: int = 100,
) -> Array:
    """Guided denoising from ``start_latents``: at each step, descend the
    latent on the summed per-sample Lp distance between the (clipped)
    pred_x0 and ``start_latents`` before applying the DDIM update — exactly
    the reference's ``_custom_guided_generation`` (utils_Img2Img.py:701-760),
    including its quirk that the guidance target is the *inverted latent*
    the loop starts from, and that each sample's gradient is independent of
    batch size (losses are summed, not averaged).
    """
    ts, t_prev = S.timestep_pairs(schedule.config, num_inference_steps)
    pairs = jnp.stack(
        [jnp.asarray(ts, jnp.int32), jnp.asarray(t_prev, jnp.int32)], axis=1
    )
    b = start_latents.shape[0]

    def recon_loss(x, t):
        model_out = denoiser(x, jnp.broadcast_to(t, (b,)), target_emb)
        pred_x0, _ = S.predict_x0_eps(schedule, model_out, t, x)
        pred_x0 = S._maybe_clip_x0(schedule, pred_x0)  # step()'s clipped x0
        return jnp.sum(lp_loss(pred_x0, start_latents, p)), model_out

    def body(x, pair):
        t = pair[0]
        (_, model_out), grad = jax.value_and_grad(recon_loss, has_aux=True)(x, t)
        x = x - guidance_loss_scale * grad
        x = S.ddim_step(schedule, model_out, t, pair[1], x)
        return x, None

    out, _ = jax.lax.scan(body, start_latents, pairs)
    return out


def guided_inverted_start(
    denoiser: cd.DenoiserFn,
    schedule: S.NoiseSchedule,
    images: Array,
    source_emb: Array,
    target_emb: Array,
    *,
    guidance_loss_scale: float = 1e-3,
    p: float = 2.0,
    num_inference_steps: int = 100,
) -> Array:
    """Invert with the source class, then reconstruction-guided generation
    toward the target (``_linear_interp_custom_guidance_inverted_start``,
    utils_Img2Img.py:651-698)."""
    latents = cd.ddim_invert(
        denoiser, schedule, images, source_emb,
        num_inference_steps=num_inference_steps,
    )
    return custom_guided_generation(
        denoiser, schedule, latents, target_emb,
        guidance_loss_scale=guidance_loss_scale, p=p,
        num_inference_steps=num_inference_steps,
    )


# -- segmented (host-driven) reconstruction-guided transfer -----------------

# Module-level jits so caches survive across calls (cf. _ddib_update).
@functools.partial(jax.jit, static_argnames=("p",))
def _guided_head(schedule, model_out, x, t, start, p):
    """Loss head of the guided step, split from the UNet: returns the loss
    and its cotangents w.r.t. (model_out, x-direct).  The total latent
    gradient is ``d_x_direct + unet_input_vjp(d_model_out)`` — exactly the
    monolithic ``custom_guided_generation``'s ``jax.value_and_grad`` chain,
    decomposed at the UNet boundary."""

    def head(mo, xx):
        x0, _ = S.predict_x0_eps(schedule, mo, t, xx)
        x0 = S._maybe_clip_x0(schedule, x0)
        return jnp.sum(lp_loss(x0, start, p))

    loss, (d_mo, d_x) = jax.value_and_grad(head, argnums=(0, 1))(model_out, x)
    return loss, d_mo, d_x


@jax.jit
def _guided_apply(schedule, x, d_x, scale, model_out, t, t_prev):
    x = x - scale * d_x
    return S.ddim_step(schedule, model_out, t, t_prev, x)


@jax.jit
def _invert_update(schedule, model_out, t, t_next, x):
    return S.ddim_inverse_step(schedule, model_out, t, t_next, x)


def custom_guided_generation_stepwise(
    fwd_vjp: Callable,  # (x, t[B], emb) -> (model_out, vjp_fn: ct -> d_x)
    schedule: S.NoiseSchedule,
    start_latents: Array,
    target_emb: Array,
    *,
    guidance_loss_scale: float = 1e-3,
    p: float = 2.0,
    num_inference_steps: int = 100,
) -> Array:
    """``custom_guided_generation`` with a host-driven step loop over a
    forward+input-VJP callable instead of ``jax.grad`` inside one scan —
    for denoisers whose monolithic grad program exceeds constrained
    compile transports (the full-width SD-2.1 segmented route,
    ``SegmentedSDUNet.forward_with_input_vjp``).  Trajectory-identical to
    the scan version (tests/test_comparison_sd.py)."""
    ts, t_prev = S.timestep_pairs(schedule.config, num_inference_steps)
    b = start_latents.shape[0]
    scale = jnp.asarray(guidance_loss_scale, jnp.float32)
    x = start_latents.astype(jnp.float32)
    for te, tp in zip(ts, t_prev):
        t_b = jnp.full((b,), int(te), jnp.int32)
        model_out, vjp_fn = fwd_vjp(x, t_b, target_emb)
        _, d_mo, d_x_direct = _guided_head(
            schedule, model_out, x, jnp.asarray(int(te)), start_latents, p
        )
        d_x = d_x_direct + vjp_fn(d_mo)
        x = _guided_apply(
            schedule, x, d_x, scale, model_out,
            jnp.asarray(int(te)), jnp.asarray(int(tp)),
        )
    return x


def guided_inverted_start_stepwise(
    denoiser: cd.DenoiserFn,
    fwd_vjp: Callable,
    schedule: S.NoiseSchedule,
    images: Array,
    source_emb: Array,
    target_emb: Array,
    *,
    guidance_loss_scale: float = 1e-3,
    p: float = 2.0,
    num_inference_steps: int = 100,
) -> Array:
    """``guided_inverted_start`` on the segmented route: host-driven DDIM
    inversion (source class) then reconstruction-guided generation (target
    class) through per-stage forward/input-VJP programs — the full-width
    version of the reference's batch-96-on-A100 guided method
    (``utils_Img2Img.py:651-760``; capacity fact
    ``examples/example_img2img_comparison_conf/batch_size/a100-80gb.yaml:2``)."""
    inv_t, inv_next = S.inversion_timestep_pairs(
        schedule.config, num_inference_steps
    )
    b = images.shape[0]
    x = images.astype(jnp.float32)
    for te, tn in zip(inv_t, inv_next):
        out = denoiser(x, jnp.full((b,), max(int(te), 0), jnp.int32), source_emb)
        x = _invert_update(
            schedule, out, jnp.asarray(int(te)), jnp.asarray(int(tn)), x
        )
    return custom_guided_generation_stepwise(
        fwd_vjp, schedule, x, target_emb,
        guidance_loss_scale=guidance_loss_scale, p=p,
        num_inference_steps=num_inference_steps,
    )


def check_gaussianity(latents: Array) -> dict:
    """Moment-based normality diagnostics of inverted latents (the reference
    runs a scipy normaltest, ``utils_Img2Img.py:79-93``); returns mean/std/
    skew/excess-kurtosis — all ≈ (0, 1, 0, 0) for a good inversion."""
    x = latents.astype(jnp.float32).ravel()
    mean = jnp.mean(x)
    std = jnp.std(x)
    z = (x - mean) / (std + 1e-12)
    return {
        "mean": mean,
        "std": std,
        "skewness": jnp.mean(z**3),
        "excess_kurtosis": jnp.mean(z**4) - 3.0,
    }
