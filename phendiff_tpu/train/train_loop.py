"""Data-parallel diffusion training step (jit over a device mesh).

Capability parity with the reference's training engine
(``src/utils_training.py:156-538``): per step —

    sample ε and uniform timesteps → forward-noise (add_noise) →
    CFG coin flip (probability ``proba_uncond``) → denoiser forward →
    loss by prediction type (ε-MSE / SNR-weighted sample-MSE / v-MSE) →
    backward → grad-norm clip at ``max_grad_norm`` → AdamW + LR schedule →
    EMA update.

TPU-native differences:

* The whole step is ONE jitted function over a ``Mesh``; the batch is
  sharded along the ``data`` axis and XLA inserts the gradient collectives
  (the reference's DDP allreduce / `find_unused_parameters` / broadcast
  coin-flip machinery disappears — same program runs on all devices with a
  shared key, so the coin flip agrees by construction, cf. the race
  workaround at ``utils_training.py:258-275``).
* The unconditional CFG branch multiplies the class embedding by a 0/1
  mask instead of branching, so a single trace covers both branches.
* Loss/grad math in f32; model compute dtype set by the precision Policy.
* NaN detection is a device-side flag aggregated into the metrics dict
  (the reference fires wandb alerts on NaN loss/grad-norm,
  ``utils_training.py:328-336,441-449``).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from phendiff_tpu.core import scheduler as S
from phendiff_tpu.train.ema import EMAConfig, ema_update

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    """Mirrors the reference's AdamW + LR-schedule flag surface
    (args_parser.py: learning_rate, adam_*, lr_scheduler, lr_warmup_steps)."""

    learning_rate: float = 1e-4
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    lr_scheduler: str = "constant"  # constant|constant_with_warmup|linear|cosine|polynomial
    lr_warmup_steps: int = 500
    total_steps: int = 100_000  # horizon for decaying schedules
    # reference scales lr by sqrt(num_processes) (train.py:268-285); here the
    # analogous knob is sqrt(data-parallel size), applied by the caller.
    lr_scale: float = 1.0
    # dtype of Adam's FIRST moment (optax mu_dtype).  "bfloat16" halves
    # the mu read+write HBM traffic of the update phase (~7 GB/step at
    # full SD width) — but MEASURED 2.6x SLOWER at full width on the TPU
    # (r5, docs/runs/r5 §6: 0.281 vs 0.108 s/step): the per-leaf casts
    # break XLA's fusion of the optimizer update into the backward, the
    # same fusion that lets the full-width step fit HBM at all.  Keep
    # "float32" unless profiling a specific model says otherwise; the
    # second moment and the master params stay f32 either way.
    moment_dtype: str = "float32"  # "float32" | "bfloat16"


def make_lr_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    peak = cfg.learning_rate * cfg.lr_scale
    warm = cfg.lr_warmup_steps
    total = max(cfg.total_steps, warm + 1)
    if cfg.lr_scheduler == "constant":
        return optax.constant_schedule(peak)
    if cfg.lr_scheduler == "constant_with_warmup":
        return optax.schedules.join_schedules(
            [optax.linear_schedule(0.0, peak, warm), optax.constant_schedule(peak)],
            [warm],
        )
    if cfg.lr_scheduler == "linear":
        return optax.schedules.join_schedules(
            [
                optax.linear_schedule(0.0, peak, warm),
                optax.linear_schedule(peak, 0.0, total - warm),
            ],
            [warm],
        )
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(0.0, peak, warm, total)
    if cfg.lr_scheduler == "polynomial":
        return optax.schedules.join_schedules(
            [
                optax.linear_schedule(0.0, peak, warm),
                optax.polynomial_schedule(peak, 0.0, 1.0, total - warm),
            ],
            [warm],
        )
    raise ValueError(f"unknown lr_scheduler: {cfg.lr_scheduler}")


def make_optimizer(
    cfg: OptimizerConfig, trainable_mask=None
) -> optax.GradientTransformation:
    """AdamW with global-norm clipping.  ``trainable_mask`` (a pytree or a
    pytree-returning callable of bools) freezes components — the reference's
    ``components_to_train`` + requires_grad freezing (``train.py:188-220``)."""
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=make_lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
            mu_dtype=(jnp.bfloat16 if cfg.moment_dtype == "bfloat16"
                      else None),
        ),
    )
    if trainable_mask is None:
        return opt
    return optax.multi_transform(
        {"train": opt, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda t: "train" if t else "freeze", trainable_mask)
        if not callable(trainable_mask)
        else (lambda p: jax.tree.map(
            lambda t: "train" if t else "freeze", trainable_mask(p)
        )),
    )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    proba_uncond: float = 0.0  # CFG unconditional-pass probability
    ema: EMAConfig = EMAConfig()
    optimizer: OptimizerConfig = OptimizerConfig()


class TrainState(struct.PyTreeNode):
    step: Array
    params: dict
    ema_params: dict
    opt_state: optax.OptState


def init_train_state(
    params: dict, optimizer: optax.GradientTransformation, copy: bool = True
) -> TrainState:
    # Copy the params into the state: the train step donates the state's
    # buffers for in-place reuse, which must not invalidate the caller's
    # (e.g. a pipeline object's) arrays.  ``copy=False`` ADOPTS the caller's
    # arrays instead — required at full SD width, where a second 3.5 GB
    # param tree does not fit beside params+EMA+moments on a 16 GB chip;
    # the caller must then treat its own references as consumed (the same
    # convention as segmented_trainer's ``copy_params=False``).
    if copy:
        params = jax.tree.map(jnp.copy, params)
    return TrainState(
        step=jnp.zeros((), dtype=jnp.int32),
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=optimizer.init(params),
    )


def diffusion_loss(
    model_apply: Callable,  # (params, x, t, class_emb) -> model_out
    params: dict,
    schedule: S.NoiseSchedule,
    clean: Array,  # [B,H,W,C] in [-1,1] (pixels, or VAE latents for SD)
    class_emb: Array,  # [B,D], already masked for the uncond branch
    rng: Array,
) -> Array:
    k_noise, k_t = jax.random.split(rng)
    b = clean.shape[0]
    noise = jax.random.normal(k_noise, clean.shape, dtype=clean.dtype)
    t = jax.random.randint(k_t, (b,), 0, schedule.num_train_timesteps)
    noisy = S.add_noise(schedule, clean, noise, t)
    model_out = model_apply(params, noisy, t, class_emb)

    pt = schedule.config.prediction_type
    if pt == "epsilon":
        target = noise
        weight = None
    elif pt == "sample":
        target = clean
        # SNR weighting from the distillation paper (utils_training.py:420-426)
        weight = S.snr(schedule, t)
    elif pt == "v_prediction":
        target = S.velocity(schedule, clean, noise, t)
        weight = None
    else:
        raise ValueError(pt)

    err = jnp.square(model_out.astype(jnp.float32) - target.astype(jnp.float32))
    per_sample = jnp.mean(err.reshape(b, -1), axis=1)
    if weight is not None:
        per_sample = per_sample * weight.astype(jnp.float32)
    return jnp.mean(per_sample)


def make_train_step(
    model_apply: Callable,  # (params, x, t, class_emb) -> model_out
    embed_fn: Callable,  # (params, labels) -> class_emb (any cond shape)
    schedule: S.NoiseSchedule,
    config: TrainConfig,
    optimizer: Optional[optax.GradientTransformation] = None,
    encode_fn: Optional[Callable] = None,  # (images, rng) -> clean targets
    encode_inside_grad: bool = False,
):
    """Build the pure train-step function; jit it with shardings at the call
    site (see ``Trainer``).  Signature:
        step(state, batch=(images, labels), rng) -> (state, metrics)

    ``encode_fn`` maps pixel batches to the diffusion space — identity for
    the pixel DDIM family, frozen-VAE encode × scaling for the SD family
    (reference ``utils_training.py:237-241``).

    ``encode_inside_grad=True`` changes the signature to
    ``encode_fn(params, images, rng)`` and differentiates THROUGH the
    encode: the reference trains the VAE when ``autoencoder`` is in
    ``components_to_train`` (``train.py:188-199``, optimizer collection
    ``:268-271``) — gradients reach the encoder via the noisy latents (and
    the sample/v targets); its decoder gets no gradient from this loss.
    """
    opt = optimizer or make_optimizer(config.optimizer)
    lr_sched = make_lr_schedule(config.optimizer)

    def train_step(state: TrainState, batch: Tuple[Array, Array], rng: Array):
        images, labels = batch
        if images.dtype == jnp.uint8:
            # uint8 transport (TrainerConfig.upload_uint8): the loader ships
            # quantized pixels (4x fewer bytes over a host→device tunnel)
            # and the normalization to [-1, 1] happens here on device —
            # the same post-resize uint8 quantization torchvision's
            # Resize→ToTensor applies in the reference's transform
            # (utils_dataset.py:104-118)
            images = images.astype(jnp.float32) / 127.5 - 1.0
        rng = jax.random.fold_in(rng, state.step)
        k_flip, k_enc, k_loss = jax.random.split(rng, 3)
        clean = (
            images if encode_fn is None or encode_inside_grad
            else encode_fn(images, k_enc)
        )

        def loss_fn(params):
            clean_l = (
                encode_fn(params, images, k_enc) if encode_inside_grad
                else clean
            )
            class_emb = embed_fn(params, labels)
            if config.proba_uncond > 0.0:
                # batch-level coin flip, identical on all devices (shared key)
                uncond = jax.random.bernoulli(k_flip, config.proba_uncond)
                class_emb = class_emb * (1.0 - uncond.astype(class_emb.dtype))
            return diffusion_loss(
                model_apply, params, schedule, clean_l, class_emb, k_loss
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        grad_norm = optax.global_norm(grads)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_step = state.step + 1
        ema_params = ema_update(config.ema, state.ema_params, params, new_step)
        state = TrainState(
            step=new_step, params=params, ema_params=ema_params, opt_state=opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "lr": lr_sched(new_step),
            "nonfinite": jnp.logical_not(
                jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            ).astype(jnp.int32),
        }
        return state, metrics

    return train_step
