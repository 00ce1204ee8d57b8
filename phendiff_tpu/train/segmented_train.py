"""Full-width SD-2.1 fine-tuning via per-stage VJP programs.

The monolithic 866M-parameter train step lowers to one HLO program that
constrained compile transports cannot ship (models/sd_segmented.py has the
forward story).  Training needs the backward too: this module runs the
loss gradient as a *chain of per-stage forward+VJP programs* — each stage
(stem / down levels / mid / up levels / out) recomputes its forward inside
its own jitted VJP (per-stage rematerialization, which also caps
activation memory) and hands cotangents to its neighbours:

    out ← up3 ← … ← up0 ← mid ← down3 ← … ← down0 ← stem

Cotangent routing mirrors the forward's skip plumbing: an up stage's VJP
emits cotangents for the 3 skip tensors it consumed, which are delivered
to the producing down stage (jax.vjp sums the x-output / skip-output
cotangents that alias the same tensor inside a stage); the timestep- and
context-embedding cotangents accumulate across every stage and flow into
the stem (time) / the returned metrics (``ctx_grad``).  Gradients are
verified to match ``jax.grad`` of the monolithic ``SDUNet``
(tests/test_segmented_train.py).

The optimizer applies per stage, immediately after each stage's VJP —
exact for per-leaf transforms, and essential for memory: only one stage's
gradients are ever live, so full-width training fits a 16 GB chip
alongside the 10.4 GB of f32 params+moments.  **The optimizer MUST be a
per-leaf transform** (adam/adamw/sgd, optionally with an optax
learning-rate schedule): a global-norm clipper like the one
``train_loop.make_optimizer`` chains would clip by each *stage's* norm
here, silently diverging from monolithic training.

Covered training semantics: all three prediction types with the same
targets/SNR weighting as ``train_loop.diffusion_loss``, shared-key CFG
dropout (``proba_uncond``), optional per-stage EMA, a nonfinite-loss
flag, and the class-conditioning gradient (``metrics["ctx_grad"]`` —
backprop it through ``pad_to_clip_sequence``/the embedding table with
``jax.vjp`` at the caller to fine-tune the custom class embedding).
Run-loop concerns (checkpoint cadence, eval, resume) stay with the
standard ``Trainer``, which covers the SD family end-to-end at widths
whose monolithic programs compile.  Reference loss:
``src/utils_training.py:490-538``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from phendiff_tpu.core import scheduler as S
from phendiff_tpu.models.sd_segmented import SegmentedSDUNet, _slice
from phendiff_tpu.train.ema import EMAConfig, ema_update

Array = jax.Array


class SegmentedSDTrainStep:
    """Callable
    ``(params, opt_state, latents, class_seq, rng, …) →
    (params, opt_state, ema_params, metrics)``
    for the reference SD fine-tune loss."""

    def __init__(self, seg: SegmentedSDUNet, schedule: S.NoiseSchedule,
                 optimizer: optax.GradientTransformation,
                 proba_uncond: float = 0.0,
                 ema: Optional[EMAConfig] = None):
        self.seg = seg
        self.schedule = schedule
        self.optimizer = optimizer
        self.proba_uncond = proba_uncond
        self.ema_config = ema
        self._vjp: Dict[str, Any] = {}
        cfg = seg.cfg
        n = len(cfg.block_out_channels)
        self._stages: List[Tuple[str, Any]] = (
            [("stem", seg._stem)]
            + [(f"down:{i}", seg._down[i]) for i in range(n)]
            + [("mid", seg._mid)]
            + [(f"up:{i}", seg._up[i]) for i in range(n)]
            + [("out", seg._out)]
        )
        self._mods = dict(self._stages)
        pt = schedule.config.prediction_type
        if pt not in ("epsilon", "sample", "v_prediction"):
            raise ValueError(f"unknown prediction_type: {pt}")

        @jax.jit
        def _prepare(latents, class_seq, rng):
            b = latents.shape[0]
            k_t, k_n, k_flip = jax.random.split(rng, 3)
            t = jax.random.randint(
                k_t, (b,), 0, schedule.num_train_timesteps, dtype=jnp.int32
            )
            noise = jax.random.normal(k_n, latents.shape, latents.dtype)
            noisy = S.add_noise(schedule, latents, noise, t)
            # target/weight dispatch mirrors train_loop.diffusion_loss
            if pt == "epsilon":
                target, weight = noise, jnp.ones((b,), jnp.float32)
            elif pt == "sample":
                target = latents
                weight = S.snr(schedule, t).astype(jnp.float32)
            else:  # v_prediction
                target = S.velocity(schedule, latents, noise, t)
                weight = jnp.ones((b,), jnp.float32)
            ctx = class_seq.astype(seg.dtype)
            if proba_uncond > 0.0:
                # batch-level coin flip, shared key (train_loop.py:216-220)
                uncond = jax.random.bernoulli(k_flip, proba_uncond)
                ctx = ctx * (1.0 - uncond.astype(ctx.dtype))
            return noisy, target, weight, t, ctx

        self._prepare = _prepare

        @jax.jit
        def _loss_head(pred, target, weight):
            b = pred.shape[0]
            diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
            per_sample = jnp.mean(jnp.square(diff).reshape(b, -1), axis=1)
            loss = jnp.mean(per_sample * weight)
            n_inner = diff.size // b
            ct = diff * (2.0 * weight / (b * n_inner)).reshape(
                (b,) + (1,) * (diff.ndim - 1)
            )
            # the cotangent must carry the network output's dtype (bf16
            # under mixed precision), not the f32 loss-math dtype
            return loss, ct.astype(pred.dtype)

        self._loss_head = _loss_head

        # Per-stage optimizer application: per-leaf transforms make this
        # EXACT while keeping only one stage's gradients live.
        @jax.jit
        def _apply_stage(pslice, opt_state, grads):
            updates, opt_state = optimizer.update(grads, opt_state, pslice)
            return optax.apply_updates(pslice, updates), opt_state

        self._apply_stage = _apply_stage

        if ema is not None:
            @jax.jit
            def _ema_stage(eslice, pslice, step):
                return ema_update(ema, eslice, pslice, step)

            self._ema_stage = _ema_stage
        self._add = jax.jit(lambda a, b: a + b)

    # -- per-stage programs -------------------------------------------------
    def _fwd_fn(self, key):
        # shares SegmentedSDUNet's jit cache: eval/transfer and training
        # reuse the same compiled stage-forward programs
        return self.seg._stage(key, self._mods[key])

    def _vjp_fn(self, key):
        if key not in self._vjp:
            mod = self._mods[key]

            @jax.jit
            def f(pslice, args, cts):
                _, vjp = jax.vjp(
                    lambda p, *a: mod.apply(p, *a), pslice, *args
                )
                return vjp(cts)

            self._vjp[key] = f
        return self._vjp[key]

    # -- the step -----------------------------------------------------------
    def __call__(self, params, opt_state, latents, class_seq, rng,
                 donate: bool = False, ema_params=None, step: int = 0):
        """``donate=True`` CONSUMES ``params``/``opt_state``/``ema_params``
        (their entries are dropped as each stage's update lands, freeing
        the old buffers).  Full-width on a 16 GB chip needs it — otherwise
        old+new params and moments coexist at peak.  The caller must not
        reuse the passed-in trees afterwards."""
        seg, cfg = self.seg, self.seg.cfg
        L = cfg.layers_per_block
        n = len(cfg.block_out_channels)
        noisy, target, weight, t, ctx = self._prepare(latents, class_seq, rng)

        # ---- forward, recording each stage's inputs -----------------------
        args_of: Dict[str, tuple] = {}
        x, temb = self._fwd_fn("stem")(
            _slice(params, seg._names("stem")), noisy, t
        )
        skips = [x]
        down_out_count: Dict[str, int] = {}
        for i in range(n):
            key = f"down:{i}"
            args_of[key] = (x, temb, ctx)
            x, outs = self._fwd_fn(key)(
                _slice(params, seg._names(key)), x, temb, ctx
            )
            skips.extend(outs)
            down_out_count[key] = len(outs)
        args_of["mid"] = (x, temb, ctx)
        x = self._fwd_fn("mid")(_slice(params, seg._names("mid")), x, temb, ctx)
        for i in range(n):
            key = f"up:{i}"
            cons = tuple(skips.pop() for _ in range(L + 1))
            args_of[key] = (x, temb, ctx, cons)
            x = self._fwd_fn(key)(
                _slice(params, seg._names(key)), x, temb, ctx, cons
            )
        assert not skips
        args_of["out"] = (x,)
        pred = self._fwd_fn("out")(_slice(params, seg._names("out")), x)

        loss, ct = self._loss_head(pred, target, weight)

        # ---- backward chain: VJP → immediate per-stage optimizer apply ----
        new_params: Dict[str, Any] = {}
        new_opt: Dict[str, Any] = {}
        new_ema: Dict[str, Any] = {}

        def apply_stage(key, gp):
            names = self._names(key)
            pslice = _slice(params, names)["params"]
            upd, st = self._apply_stage(pslice, opt_state[key], gp["params"])
            new_params.update(upd)
            new_opt[key] = st
            if ema_params is not None:
                eslice = {k: ema_params["params"][k] for k in upd}
                new_ema.update(self._ema_stage(eslice, upd, step + 1))
            if donate:
                for k in list(pslice):
                    params["params"].pop(k, None)
                    if ema_params is not None:
                        ema_params["params"].pop(k, None)
                opt_state.pop(key, None)

        gp, ct_x = self._vjp_fn("out")(
            _slice(params, self._names("out")), args_of["out"], ct
        )
        apply_stage("out", gp)

        ct_temb = None
        ct_ctx = None

        def acc(a, b):
            return b if a is None else a + b

        skip_cts: List[Any] = []  # cotangents for the global skip stack
        for i in reversed(range(n)):
            key = f"up:{i}"
            gp, ct_x, d_temb, d_ctx, d_skips = self._vjp_fn(key)(
                _slice(params, self._names(key)), args_of[key], ct_x
            )
            apply_stage(key, gp)
            ct_temb = acc(ct_temb, d_temb)
            ct_ctx = acc(ct_ctx, d_ctx)
            # cons was popped off the stack top, so reversed(d_skips) is in
            # stack order; processing up stages last-to-first walks the
            # stack bottom-up — append to rebuild bottom→top order
            skip_cts = skip_cts + list(reversed(d_skips))

        gp, ct_x, d_temb, d_ctx = self._vjp_fn("mid")(
            _slice(params, self._names("mid")), args_of["mid"], ct_x
        )
        apply_stage("mid", gp)
        ct_temb = acc(ct_temb, d_temb)
        ct_ctx = acc(ct_ctx, d_ctx)

        for i in reversed(range(n)):
            key = f"down:{i}"
            cnt = down_out_count[key]
            outs_ct = skip_cts[-cnt:]
            skip_cts = skip_cts[:-cnt]
            gp, d_x, d_temb, d_ctx = self._vjp_fn(key)(
                _slice(params, self._names(key)), args_of[key],
                (ct_x, outs_ct),
            )
            apply_stage(key, gp)
            ct_x = d_x
            ct_temb = acc(ct_temb, d_temb)
            ct_ctx = acc(ct_ctx, d_ctx)

        # the single remaining slot is conv_in's output consumed as the
        # deepest up-stage skip
        (stem_skip_ct,) = skip_cts
        ct_x = self._add(ct_x, stem_skip_ct)
        gp, _d_sample, _d_t = self._vjp_fn("stem")(
            _slice(params, self._names("stem")), (noisy, t), (ct_x, ct_temb)
        )
        apply_stage("stem", gp)

        metrics = {
            "loss": loss,
            "nonfinite": jnp.logical_not(jnp.isfinite(loss)).astype(jnp.float32),
            # conditioning-sequence gradient; chain it through the class
            # embedding's pad/projection at the caller to train it
            "ctx_grad": ct_ctx,
        }
        ema_out = {"params": new_ema} if ema_params is not None else None
        return {"params": new_params}, new_opt, ema_out, metrics

    def _names(self, key):
        return self.seg._names(key)

    def init_opt_state(self, params):
        return {
            key: self.optimizer.init(
                _slice(params, self._names(key))["params"]
            )
            for key, _ in self._stages
        }
