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
the stem (time) / the ``ctx`` stage or ``metrics["ctx_grad"]`` (class
conditioning).  Gradients are verified to match ``jax.grad`` of the
monolithic ``SDUNet`` (tests/test_segmented_train.py).

The optimizer applies per stage — exact for per-leaf transforms, and
essential for memory: at most one stage's gradients are live during the
apply, so full-width training fits a 16 GB chip alongside the 10.4 GB of
f32 params+moments.  Per-leaf-ness is ENFORCED at construction
(``check_per_leaf_optimizer``): a globally-coupled transform like
``optax.clip_by_global_norm`` chained into the optimizer would silently
clip by each *stage's* norm.  The reference's global grad clipping
(``src/utils_training.py:439-449``, always max_grad_norm=1.0) is instead
provided natively via ``max_grad_norm=``, with two exact schemes:

* ``clip_mode="cache"`` — one backward chain; per-stage gradients are
  cached (f32, ≈3.5 GB at full width) while the global squared norm
  accumulates, then every stage's cached gradient is scaled by the global
  clip factor and applied.  Fastest; needs grad-sized headroom.
* ``clip_mode="recompute"`` — two backward chains; the first computes
  only the squared norms (each stage's gradients are reduced and dropped
  immediately), the second re-runs the same VJP programs with the loss
  cotangent pre-scaled by the clip factor — gradients are linear in the
  cotangent, so every leaf comes out exactly ``scale * grad`` — and
  applies per stage.  ≤1 stage's gradients ever live; costs a second
  backward.

Class-embedding fine-tuning (``components_to_train`` including
``class_embedding``, reference ``src/utils_training.py:459-496``) is a
first-class ``ctx`` stage: pass ``ctx_module=CtxEmbed(...)`` and integer
labels instead of a precomputed conditioning sequence, and the embedding
table trains through the same per-stage optimizer/EMA/clip machinery —
including the CFG-dropout mask in its chain rule (a dropped batch sends
zero gradient to the embedding, matching the reference's uncond pass).

Covered training semantics: all three prediction types with the same
targets/SNR weighting as ``train_loop.diffusion_loss``, shared-key CFG
dropout (``proba_uncond``), optional per-stage EMA, a nonfinite-loss
flag, and the global grad-norm metric.  Run-loop concerns (checkpoint
cadence, eval, resume) live in ``train/segmented_trainer.py``.
Reference loss: ``src/utils_training.py:490-538``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from phendiff_tpu.core import scheduler as S
from phendiff_tpu.models.embeddings import ClassEmbedding, pad_to_clip_sequence
from phendiff_tpu.models.sd_segmented import SegmentedSDUNet, _slice
from phendiff_tpu.train.ema import EMAConfig, ema_update

Array = jax.Array


class CtxEmbed(nn.Module):
    """The SD class-conditioning head as a trainable stage: embedding-table
    lookup + CLIP-sequence padding (reference ``utils_training.py:479-484``).

    The param tree is ``{"class_embedding": {"embedding": {"embedding": t}}}``
    whose inner structure matches ``SDImg2ImgPipeline.class_embedding_params``
    — weights move 1:1 between the pipeline and the segmented trainer.
    """

    num_classes: int
    embedding_dim: int = 1024
    seq_len: int = 77
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, labels: Array) -> Array:
        emb = ClassEmbedding(
            self.num_classes, self.embedding_dim, name="class_embedding"
        )(labels)
        return pad_to_clip_sequence(emb.astype(self.dtype), self.seq_len)


def check_per_leaf_optimizer(optimizer: optax.GradientTransformation) -> None:
    """Reject globally-coupled gradient transforms.

    Per-stage application is exact only when each leaf's update depends on
    that leaf's own gradient/param/state.  A chained
    ``optax.clip_by_global_norm`` (what ``train_loop.make_optimizer``
    builds — the reference's max_grad_norm semantics) violates this and
    would silently clip by each stage's norm.  Probe: run TWO update steps
    on a two-leaf tree, twice, with only leaf ``b``'s first-step gradient
    changed; leaf ``a``'s updates must not move.  (Two steps because
    Adam's *first* update is scale-invariant — ``g/√g²`` — so a global
    clip only becomes visible through the moment accumulators.)
    Structure-bound optimizers that cannot init on the probe tree are
    skipped (the caller takes responsibility).
    """
    probe = {"a": jnp.ones((2,), jnp.float32), "b": jnp.zeros((3,), jnp.float32)}
    ga1 = {"a": jnp.full((2,), 100.0), "b": jnp.zeros((3,), jnp.float32)}
    gb1 = {"a": jnp.full((2,), 100.0), "b": jnp.full((3,), 1e4, jnp.float32)}
    g_2 = {"a": jnp.full((2,), 1.0), "b": jnp.zeros((3,), jnp.float32)}

    def two_steps(g_first):
        st = optimizer.init(probe)
        u1, st = optimizer.update(g_first, st, probe)
        p = optax.apply_updates(probe, u1)
        u2, _ = optimizer.update(g_2, st, p)
        return u1["a"], u2["a"]

    try:
        u1a, u2a = two_steps(ga1)
        u1b, u2b = two_steps(gb1)
    except Exception:
        return
    if not (
        np.allclose(np.asarray(u1a), np.asarray(u1b))
        and np.allclose(np.asarray(u2a), np.asarray(u2b))
    ):
        raise ValueError(
            "SegmentedSDTrainStep requires a PER-LEAF optimizer (adam/adamw/"
            "sgd, optionally with an lr schedule or a multi_transform "
            "freeze mask). The one passed couples leaves globally — e.g. a "
            "chained optax.clip_by_global_norm — which per-stage "
            "application would silently turn into per-STAGE clipping. Pass "
            "the reference's global grad clipping via max_grad_norm= "
            "instead (utils_training.py:439-449)."
        )


class SegmentedSDTrainStep:
    """Callable
    ``(params, opt_state, latents, cond, rng, …) →
    (params, opt_state, ema_params, metrics)``
    for the reference SD fine-tune loss.

    ``cond`` is the conditioning sequence ``[B, 77, D]`` — or integer class
    labels ``[B]`` when ``ctx_module`` is provided, in which case
    ``params["params"]["class_embedding"]`` holds the embedding stage and
    trains alongside the UNet.
    """

    def __init__(self, seg: SegmentedSDUNet, schedule: S.NoiseSchedule,
                 optimizer: optax.GradientTransformation,
                 proba_uncond: float = 0.0,
                 ema: Optional[EMAConfig] = None,
                 max_grad_norm: Optional[float] = None,
                 clip_mode: str = "cache",
                 ctx_module: Optional[nn.Module] = None,
                 device_of: Optional[Dict[str, Any]] = None,
                 cache_dtype: Optional[Any] = None):
        """``device_of`` (stage key → jax.Device) turns the chain into
        PIPELINE-PARALLEL training: each stage's params/optimizer/EMA are
        resident on its device (``parallel/pp.py``'s placement), and
        activations (forward) / cotangents (backward) move device-to-device
        at stage boundaries — jit outputs are committed arrays, so every
        boundary is an explicit transfer, exactly like the forward-only
        ``PipelinedSDUNet``.  Scheduling stays JAX async dispatch.  The
        ``ctx`` stage and the scalar clip/norm reductions live on the
        stem's device.  None (default) = single-chip, unchanged.

        ``cache_dtype`` (``clip_mode="cache"`` only): dtype of the cached
        per-stage gradients between the backward chain and the clip-scaled
        apply.  ``jnp.bfloat16`` halves the cache (≈1.75 GB instead of 3.5
        at full width — enough headroom to prefer the single-backward
        "cache" mode over the 2x-backward "recompute" on a 16 GB chip,
        VERDICT r3 #2).  The global norm is still computed on the exact
        f32 gradients BEFORE the cast; only the cached values round.  None
        (default) keeps the cache exact."""
        check_per_leaf_optimizer(optimizer)
        if clip_mode not in ("cache", "recompute"):
            raise ValueError(f"unknown clip_mode: {clip_mode!r}")
        self.device_of = device_of
        self.seg = seg
        self.schedule = schedule
        self.optimizer = optimizer
        self.proba_uncond = proba_uncond
        self.ema_config = ema
        self.max_grad_norm = max_grad_norm
        self.clip_mode = clip_mode
        self.cache_dtype = cache_dtype
        self.ctx_module = ctx_module
        if cache_dtype is not None and clip_mode != "cache":
            raise ValueError("cache_dtype only applies to clip_mode='cache'")
        self._to_cache = (
            jax.jit(lambda g: jax.tree.map(
                lambda x: x.astype(cache_dtype), g
            ))
            if cache_dtype is not None else (lambda g: g)
        )
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
        if ctx_module is not None:
            self._stages.append(("ctx", ctx_module))
        self._mods = dict(self._stages)
        pt = schedule.config.prediction_type
        if pt not in ("epsilon", "sample", "v_prediction"):
            raise ValueError(f"unknown prediction_type: {pt}")

        @jax.jit
        def _prepare(latents, rng):
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
            if proba_uncond > 0.0:
                # batch-level coin flip, shared key (train_loop.py:216-220)
                uncond = jax.random.bernoulli(k_flip, proba_uncond)
                keep = 1.0 - uncond.astype(jnp.float32)
            else:
                keep = jnp.ones((), jnp.float32)
            return noisy, target, weight, t, keep

        self._prepare = _prepare

        dtype = seg.dtype
        # CFG-dropout mask on the conditioning sequence, and its chain rule
        # for the raw-conditioning cotangent (a dropped batch must send
        # ZERO gradient into the class embedding — the reference's uncond
        # pass never touches it, hence its find_unused_parameters hack)
        self._mask_ctx = jax.jit(
            lambda c, keep: c.astype(dtype) * keep.astype(dtype)
        )
        self._mask_ct = jax.jit(lambda ct, keep: ct * keep.astype(ct.dtype))

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
        # EXACT while keeping only one stage's gradients live.  ``scale``
        # is the global clip factor (1.0 when no clipping applies).
        def _apply_stage(pslice, opt_state, grads, scale):
            grads = jax.tree.map(lambda g: g * scale.astype(g.dtype), grads)
            updates, opt_state = optimizer.update(grads, opt_state, pslice)
            return optax.apply_updates(pslice, updates), opt_state

        self._apply_stage = jax.jit(_apply_stage)
        # donating variant for donate=True calls: old params / moments /
        # grads hand their HBM buffers to the new values, so a stage's
        # transient footprint is ~1x its size instead of ~6x — at full
        # width the non-donating apply OOMs a 16 GB chip once the trainer's
        # VAE/eval residents are also live (r3 hardware run)
        self._apply_stage_d = jax.jit(_apply_stage, donate_argnums=(0, 1, 2))

        # squared-norm reduction of one stage's gradient slice (f32, as
        # optax.global_norm computes it)
        self._sq_norm = jax.jit(
            lambda g: sum(
                jnp.sum(jnp.square(x.astype(jnp.float32)))
                for x in jax.tree.leaves(g)
            )
        )
        max_norm = max_grad_norm if max_grad_norm is not None else 0.0

        @jax.jit
        def _clip_scale(sq):
            g_norm = jnp.sqrt(sq)
            # optax.clip_by_global_norm semantics: identity below the
            # threshold, scale to max_norm above it
            return jnp.where(g_norm < max_norm, 1.0, max_norm / g_norm), g_norm

        self._clip_scale = _clip_scale
        self._scale_ct = jax.jit(lambda ct, s: ct * s.astype(ct.dtype))

        if ema is not None:
            def _ema_stage(eslice, pslice, step):
                return ema_update(ema, eslice, pslice, step)

            self._ema_stage = jax.jit(_ema_stage)
            # donate only the old EMA slice — pslice is the fresh update
            # that stays live in new_params
            self._ema_stage_d = jax.jit(_ema_stage, donate_argnums=(0,))
        self._add = jax.jit(lambda a, b: a + b)

        if ctx_module is not None:
            @jax.jit
            def _ctx_vjp(pslice, labels, ct_raw):
                _, vjp = jax.vjp(
                    lambda p: ctx_module.apply(p, labels), pslice
                )
                (gp,) = vjp(ct_raw)
                return gp["params"]

            self._ctx_vjp = _ctx_vjp

    # -- pipeline placement ---------------------------------------------------
    def _dev(self, key):
        if not self.device_of:
            return None
        if key == "ctx":  # tiny; rides with the stem (common device)
            return self.device_of.get("ctx", self.device_of.get("stem"))
        return self.device_of.get(key)

    @property
    def _common_dev(self):
        """Device for cross-stage scalar reductions (grad-norm, clip)."""
        return self.device_of.get("stem") if self.device_of else None

    @staticmethod
    def _put_leaf(dev, a):
        if dev is None:
            return a
        if isinstance(a, jax.Array) and a.committed and a.devices() == {dev}:
            return a
        return jax.device_put(a, dev)

    def _to(self, key, *arrays):
        """Move arrays (or pytrees) onto ``key``'s stage device (no-op when
        unplaced); single argument returns unwrapped."""
        dev = self._dev(key)
        out = tuple(
            jax.tree.map(lambda x: self._put_leaf(dev, x), a) for a in arrays
        )
        return out[0] if len(out) == 1 else out

    def place_params(self, params):
        """Commit each stage's parameter slice to its pipeline device
        (merged-tree layout in, merged-tree layout out)."""
        if not self.device_of:
            return params
        p = dict(params["params"])
        for key, _ in self._stages:
            dev = self._dev(key)
            for name in self._names(key):
                if name in p and dev is not None:
                    p[name] = jax.device_put(p[name], dev)
        return {"params": p}

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

    # -- backward chain -----------------------------------------------------
    def _run_backward(self, params, args_of, noisy, t, ct, down_out_count,
                      on_stage: Callable[[str, Any], None]):
        """VJP chain out → up* → mid → down* → stem; calls
        ``on_stage(key, grads_pslice)`` per stage and returns the
        accumulated cotangent of the MASKED conditioning sequence."""
        n = len(self.seg.cfg.block_out_channels)
        gp, ct_x = self._vjp_fn("out")(
            _slice(params, self._names("out")), args_of["out"],
            self._to("out", ct),
        )
        on_stage("out", gp["params"])

        ct_temb = None
        ct_ctx = None

        def acc(a, b):
            return b if a is None else a + b

        skip_cts: List[Any] = []  # cotangents for the global skip stack
        for i in reversed(range(n)):
            key = f"up:{i}"
            gp, ct_x, d_temb, d_ctx, d_skips = self._vjp_fn(key)(
                _slice(params, self._names(key)), args_of[key],
                self._to(key, ct_x),
            )
            on_stage(key, gp["params"])
            # embedding cotangents accumulate on their consumers' devices
            # (temb → stem, ctx → the ctx stage) so the eager adds and the
            # final VJPs see device-consistent operands
            ct_temb = acc(ct_temb, self._to("stem", d_temb))
            ct_ctx = acc(ct_ctx, self._to("ctx", d_ctx))
            # cons was popped off the stack top, so reversed(d_skips) is in
            # stack order; processing up stages last-to-first walks the
            # stack bottom-up — append to rebuild bottom→top order
            skip_cts = skip_cts + list(reversed(d_skips))

        gp, ct_x, d_temb, d_ctx = self._vjp_fn("mid")(
            _slice(params, self._names("mid")), args_of["mid"],
            self._to("mid", ct_x),
        )
        on_stage("mid", gp["params"])
        ct_temb = acc(ct_temb, self._to("stem", d_temb))
        ct_ctx = acc(ct_ctx, self._to("ctx", d_ctx))

        for i in reversed(range(n)):
            key = f"down:{i}"
            cnt = down_out_count[key]
            outs_ct = [self._to(key, c) for c in skip_cts[-cnt:]]
            skip_cts = skip_cts[:-cnt]
            gp, d_x, d_temb, d_ctx = self._vjp_fn(key)(
                _slice(params, self._names(key)), args_of[key],
                (self._to(key, ct_x), outs_ct),
            )
            on_stage(key, gp["params"])
            ct_x = d_x
            ct_temb = acc(ct_temb, self._to("stem", d_temb))
            ct_ctx = acc(ct_ctx, self._to("ctx", d_ctx))

        # the single remaining slot is conv_in's output consumed as the
        # deepest up-stage skip
        (stem_skip_ct,) = skip_cts
        ct_x = self._add(
            self._to("stem", ct_x), self._to("stem", stem_skip_ct)
        )
        gp, _d_sample, _d_t = self._vjp_fn("stem")(
            _slice(params, self._names("stem")), (noisy, t), (ct_x, ct_temb)
        )
        on_stage("stem", gp["params"])
        return ct_ctx

    # -- the step -----------------------------------------------------------
    def __call__(self, params, opt_state, latents, cond, rng,
                 donate: bool = False, ema_params=None, step: int = 0):
        """``donate=True`` CONSUMES ``params``/``opt_state``/``ema_params``
        (their entries are dropped as each stage's update lands, freeing
        the old buffers).  Full-width on a 16 GB chip needs it — otherwise
        old+new params and moments coexist at peak.  The caller must not
        reuse the passed-in trees afterwards."""
        seg, cfg = self.seg, self.seg.cfg
        L = cfg.layers_per_block
        n = len(cfg.block_out_channels)
        noisy, target, weight, t, keep = self._prepare(latents, rng)
        # pipeline placement: each stage's jit outputs are committed, so
        # every stage boundary is an explicit transfer (no-ops unplaced)
        noisy, t = self._to("stem", noisy), self._to("stem", t)
        target, weight = self._to("out", target), self._to("out", weight)
        keep = self._to("ctx", keep)

        if self.ctx_module is not None:
            labels = cond
            ctx_raw = self._fwd_fn("ctx")(
                _slice(params, self._names("ctx")), labels
            )
        else:
            ctx_raw = self._to("ctx", cond)
        ctx = self._mask_ctx(ctx_raw, keep)

        # ---- forward, recording each stage's inputs -----------------------
        args_of: Dict[str, tuple] = {}
        x, temb = self._fwd_fn("stem")(
            _slice(params, seg._names("stem")), noisy, t
        )
        skips = [x]
        down_out_count: Dict[str, int] = {}
        for i in range(n):
            key = f"down:{i}"
            args_of[key] = self._to(key, x, temb, ctx)
            x, outs = self._fwd_fn(key)(
                _slice(params, seg._names(key)), *args_of[key]
            )
            skips.extend(outs)
            down_out_count[key] = len(outs)
        args_of["mid"] = self._to("mid", x, temb, ctx)
        x = self._fwd_fn("mid")(
            _slice(params, seg._names("mid")), *args_of["mid"]
        )
        for i in range(n):
            key = f"up:{i}"
            cons = tuple(
                self._to(key, skips.pop()) for _ in range(L + 1)
            )
            args_of[key] = self._to(key, x, temb, ctx) + (cons,)
            x = self._fwd_fn(key)(
                _slice(params, seg._names(key)), *args_of[key]
            )
        assert not skips
        args_of["out"] = (self._to("out", x),)
        pred = self._fwd_fn("out")(
            _slice(params, seg._names("out")), *args_of["out"]
        )

        loss, ct = self._loss_head(pred, target, weight)

        # ---- backward + per-stage optimizer apply -------------------------
        new_params: Dict[str, Any] = {}
        new_opt: Dict[str, Any] = {}
        new_ema: Dict[str, Any] = {}
        ones = jnp.ones((), jnp.float32)

        def apply_stage(key, grads, scale):
            names = self._names(key)
            pslice = _slice(params, names)["params"]
            # donate=True uses the buffer-donating jits: each stage's old
            # params/moments/EMA and its grads hand their HBM to the new
            # values, capping the transient at ~1x stage size (full width
            # OOMs otherwise once the trainer's VAE/eval residents are
            # live).  Safe: a stage's params/EMA are last READ by its own
            # VJP, which runs before on_stage fires.
            apply_fn = self._apply_stage_d if donate else self._apply_stage
            upd, st = apply_fn(
                pslice, opt_state[key], grads, self._to(key, scale)
            )
            new_params.update(upd)
            new_opt[key] = st
            if ema_params is not None:
                eslice = {k: ema_params["params"][k] for k in upd}
                ema_fn = self._ema_stage_d if donate else self._ema_stage
                new_ema.update(ema_fn(eslice, upd, step + 1))
            if donate:
                for k in list(pslice):
                    params["params"].pop(k, None)
                    if ema_params is not None:
                        ema_params["params"].pop(k, None)
                opt_state.pop(key, None)

        sq_total = jnp.zeros((), jnp.float32)
        common = self._common_dev

        def add_sq(grads):
            nonlocal sq_total
            sq = self._sq_norm(grads)
            if common is not None:
                sq = self._put_leaf(common, sq)
            sq_total = self._add(sq_total, sq)

        ctx_grad_out = None
        if self.max_grad_norm is None:
            # single chain, apply immediately (grad_norm is still reported)
            def run(key, grads):
                add_sq(grads)
                apply_stage(key, grads, ones)

            ct_ctx = self._run_backward(
                params, args_of, noisy, t, ct, down_out_count, run
            )
            ct_ctx_raw = self._mask_ct(ct_ctx, keep)
            if self.ctx_module is not None:
                g_ctx = self._ctx_vjp(
                    _slice(params, self._names("ctx")), labels, ct_ctx_raw
                )
                add_sq(g_ctx)
                apply_stage("ctx", g_ctx, ones)
            else:
                ctx_grad_out = ct_ctx_raw
            grad_norm = jnp.sqrt(sq_total)
        elif self.clip_mode == "cache":
            # single chain, cache per-stage grads, scale-then-apply
            cache: Dict[str, Any] = {}

            def collect(key, grads):
                add_sq(grads)  # exact f32 norm, before any cache cast
                cache[key] = self._to_cache(grads)

            ct_ctx = self._run_backward(
                params, args_of, noisy, t, ct, down_out_count, collect
            )
            ct_ctx_raw = self._mask_ct(ct_ctx, keep)
            if self.ctx_module is not None:
                g_ctx = self._ctx_vjp(
                    _slice(params, self._names("ctx")), labels, ct_ctx_raw
                )
                add_sq(g_ctx)
                cache["ctx"] = g_ctx
            else:
                ctx_grad_out = ct_ctx_raw
            scale, grad_norm = self._clip_scale(sq_total)
            for key in list(cache):
                apply_stage(key, cache.pop(key), scale)
        else:  # clip_mode == "recompute"
            # chain 1: squared norms only (grads dropped immediately)
            def norm_only(key, grads):
                add_sq(grads)

            ct_ctx1 = self._run_backward(
                params, args_of, noisy, t, ct, down_out_count, norm_only
            )
            ct_ctx1_raw = self._mask_ct(ct_ctx1, keep)
            if self.ctx_module is not None:
                add_sq(self._ctx_vjp(
                    _slice(params, self._names("ctx")), labels, ct_ctx1_raw
                ))
            else:
                ctx_grad_out = ct_ctx1_raw
            scale, grad_norm = self._clip_scale(sq_total)
            # chain 2: cotangent pre-scaled → every grad is scale*grad
            def run(key, grads):
                apply_stage(key, grads, ones)

            ct_ctx = self._run_backward(
                params, args_of, noisy, t,
                self._scale_ct(ct, self._to("out", scale)),
                down_out_count, run,
            )
            if self.ctx_module is not None:
                g_ctx = self._ctx_vjp(
                    _slice(params, self._names("ctx")), labels,
                    self._mask_ct(ct_ctx, keep),
                )
                apply_stage("ctx", g_ctx, ones)

        metrics = {
            "loss": loss,
            "grad_norm": grad_norm,
            "nonfinite": jnp.logical_not(jnp.isfinite(loss)).astype(jnp.float32),
        }
        if ctx_grad_out is not None:
            # UNCLIPPED conditioning-sequence gradient (already carries the
            # CFG-dropout mask); callers chaining an external embedding
            # should prefer ctx_module= so it shares the global clip
            metrics["ctx_grad"] = ctx_grad_out
        ema_out = {"params": new_ema} if ema_params is not None else None
        return {"params": new_params}, new_opt, ema_out, metrics

    def _names(self, key):
        if key == "ctx":
            return ["class_embedding"]
        return self.seg._names(key)

    def init_opt_state(self, params):
        return {
            key: self.optimizer.init(
                _slice(params, self._names(key))["params"]
            )
            for key, _ in self._stages
        }
