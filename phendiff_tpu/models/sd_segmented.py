"""Segmented execution of the full-width SD UNet.

The monolithic 866M-parameter forward lowers to one HLO program too large
for constrained compile transports (the dev tunnel's remote-compile POST
dies with a broken pipe; docs/BENCHMARKS.md).  This module executes the
SAME parameter tree (identical module names and math as ``SDUNet``) as a
pipeline of ~11 small per-stage jit programs — stem, one per down level,
mid, one per up level, out — each compiling independently.

Numerics match the monolithic module op-for-op (only XLA fusion
boundaries differ); ``tests/test_sd_segmented.py`` asserts equivalence.
Dispatch is async, so the stage chain pipelines on-device; the cost vs the
monolithic program is the lost cross-stage fusion (skip tensors round-trip
through HBM — which they mostly do anyway at these sizes).

Reference context: the torch implementation never needs this because
eager execution has no whole-program compile (``src/utils_models.py:67-122``
just loads and runs); it is purely a compile-transport workaround, not an
architecture difference.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from phendiff_tpu.models.embeddings import (
    TimestepEmbedMLP,
    sinusoidal_timestep_embedding,
)
from phendiff_tpu.models.sd_unet import (
    Downsample2D,
    ResnetBlock,
    SDUNetConfig,
    Transformer2D,
    Upsample2D,
)
from phendiff_tpu.ops.group_norm import group_norm

Array = jax.Array


class _Stem(nn.Module):
    cfg: SDUNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sample, timesteps):
        cfg = self.cfg
        x = sample.astype(self.dtype)
        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))
        temb = sinusoidal_timestep_embedding(
            timesteps, cfg.block_out_channels[0],
            flip_sin_to_cos=cfg.flip_sin_to_cos, freq_shift=cfg.freq_shift,
        )
        temb = TimestepEmbedMLP(
            cfg.time_embed_dim, dtype=self.dtype, name="time_embedding"
        )(temb.astype(self.dtype))
        x = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(x)
        return x, temb


class _DownStage(nn.Module):
    cfg: SDUNetConfig
    level: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctx):
        cfg, i = self.cfg, self.level
        btype = cfg.down_block_types[i]
        c_out = cfg.block_out_channels[i]
        head_dim = c_out // cfg.heads_at(i)
        outs = []
        for j in range(cfg.layers_per_block):
            x = ResnetBlock(
                c_out, norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps, dtype=self.dtype,
                name=f"down_{i}_res_{j}",
            )(x, temb)
            if btype == "CrossAttnDownBlock2D":
                x = Transformer2D(
                    cfg.heads_at(i), head_dim, cfg.norm_num_groups,
                    cfg.use_linear_projection, self.dtype,
                    name=f"down_{i}_attn_{j}",
                )(x, ctx)
            outs.append(x)
        if i < len(cfg.block_out_channels) - 1:
            x = Downsample2D(
                c_out, padding=cfg.downsample_padding, dtype=self.dtype,
                name=f"down_{i}_downsample",
            )(x)
            outs.append(x)
        return x, outs


class _Mid(nn.Module):
    cfg: SDUNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctx):
        cfg = self.cfg
        c_mid = cfg.block_out_channels[-1]
        lvl = len(cfg.block_out_channels) - 1
        x = ResnetBlock(c_mid, norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps, dtype=self.dtype,
                        name="mid_res_0")(x, temb)
        x = Transformer2D(
            cfg.heads_at(lvl), c_mid // cfg.heads_at(lvl),
            cfg.norm_num_groups, cfg.use_linear_projection, self.dtype,
            name="mid_attn",
        )(x, ctx)
        x = ResnetBlock(c_mid, norm_num_groups=cfg.norm_num_groups,
                        norm_eps=cfg.norm_eps, dtype=self.dtype,
                        name="mid_res_1")(x, temb)
        return x


class _UpStage(nn.Module):
    cfg: SDUNetConfig
    level: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temb, ctx, skips: Tuple[Array, ...]):
        cfg, i = self.cfg, self.level
        btype = cfg.up_block_types[i]
        c_out = tuple(reversed(cfg.block_out_channels))[i]
        lvl = len(cfg.block_out_channels) - 1 - i
        head_dim = c_out // cfg.heads_at(lvl)
        for j in range(cfg.layers_per_block + 1):
            x = jnp.concatenate([x, skips[j].astype(self.dtype)], axis=-1)
            x = ResnetBlock(
                c_out, norm_num_groups=cfg.norm_num_groups,
                norm_eps=cfg.norm_eps, dtype=self.dtype,
                name=f"up_{i}_res_{j}",
            )(x, temb)
            if btype == "CrossAttnUpBlock2D":
                x = Transformer2D(
                    cfg.heads_at(lvl), head_dim, cfg.norm_num_groups,
                    cfg.use_linear_projection, self.dtype,
                    name=f"up_{i}_attn_{j}",
                )(x, ctx)
        if i < len(cfg.up_block_types) - 1:
            x = Upsample2D(c_out, dtype=self.dtype, name=f"up_{i}_upsample")(x)
        return x


class _Out(nn.Module):
    cfg: SDUNetConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        c = x.shape[-1]
        x = group_norm(
            x, num_groups=cfg.norm_num_groups, eps=cfg.norm_eps,
            scale=self.param("norm_out_scale", nn.initializers.ones, (c,)),
            bias=self.param("norm_out_bias", nn.initializers.zeros, (c,)),
            act="silu",
            out_dtype=self.dtype,
        )
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(x)
        return x


def _slice(params, names):
    p = params["params"] if "params" in params else params
    return {"params": {k: p[k] for k in names if k in p}}


class SegmentedSDUNet:
    """Callable drop-in for ``SDUNet.apply(params, x, t, ctx)`` that runs
    the forward as ~11 independently-jitted stage programs."""

    def __init__(self, cfg: SDUNetConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        n = len(cfg.block_out_channels)
        self._stem = _Stem(cfg, dtype)
        self._down = [_DownStage(cfg, i, dtype) for i in range(n)]
        self._mid = _Mid(cfg, dtype)
        self._up = [_UpStage(cfg, i, dtype) for i in range(n)]
        self._out = _Out(cfg, dtype)
        self._jit: Dict[str, Any] = {}

    def _stage(self, key, mod):
        if key not in self._jit:
            self._jit[key] = jax.jit(mod.apply)
        return self._jit[key]

    def _names(self, key) -> List[str]:
        cfg = self.cfg
        L = cfg.layers_per_block
        if key == "stem":
            return ["time_embedding", "conv_in"]
        if key == "mid":
            return ["mid_res_0", "mid_attn", "mid_res_1"]
        if key == "out":
            return ["norm_out_scale", "norm_out_bias", "conv_out"]
        kind, i = key.split(":")
        i = int(i)
        if kind == "down":
            return (
                [f"down_{i}_res_{j}" for j in range(L)]
                + [f"down_{i}_attn_{j}" for j in range(L)]
                + [f"down_{i}_downsample"]
            )
        return (
            [f"up_{i}_res_{j}" for j in range(L + 1)]
            + [f"up_{i}_attn_{j}" for j in range(L + 1)]
            + [f"up_{i}_upsample"]
        )

    def init(self, rng, sample, timesteps, encoder_hidden_states):
        """Stage-by-stage init (each init is its own small program — the
        monolithic ``SDUNet.init`` is a full-model HLO and hits the same
        transport limit as the forward).  BIT-IDENTICAL to the monolithic
        init seed-for-seed: Flax folds the params rng by module *path*,
        and every stage's children carry exactly the monolith's root-level
        names — so passing the same root rng to each stage reproduces the
        monolith's per-parameter streams (tests/test_sd_segmented.py::
        test_segmented_init_matches_monolithic)."""
        cfg = self.cfg
        merged: Dict[str, Any] = {}

        def take(key, mod, *args):
            nonlocal merged
            out, variables = mod.init_with_output(rng, *args)
            merged.update(variables["params"])
            return out

        ctx = encoder_hidden_states.astype(self.dtype)
        x, temb = take("stem", self._stem, sample, timesteps)
        for i, mod in enumerate(self._down):
            x, _ = take(f"down:{i}", mod, x, temb, ctx)
        x = take("mid", self._mid, x, temb, ctx)
        rev = tuple(reversed(cfg.block_out_channels))
        n = len(cfg.block_out_channels)
        for i, mod in enumerate(self._up):
            # shape-correct dummy skips for this level (values irrelevant)
            lvl = n - 1 - i
            hw = x.shape[1]
            skip_ch = []
            for j in range(cfg.layers_per_block + 1):
                skip_ch.append(
                    rev[min(i + 1, n - 1)] if j == cfg.layers_per_block
                    else rev[i]
                )
            skips = tuple(
                jnp.zeros((x.shape[0], hw, hw, c), self.dtype)
                for c in skip_ch
            )
            x = take(f"up:{i}", mod, x, temb, ctx, skips)
        take("out", self._out, x)
        return {"params": merged}

    def cost_flops(self, params, sample, timesteps, encoder_hidden_states):
        """XLA-reported FLOPs of ONE forward = sum over the stage programs'
        cost analyses (each lower+compile hits the persistent compilation
        cache after the first run).  Used by bench.py for MFU."""
        total = 0.0

        def run(key, mod, *args):
            nonlocal total
            pslice = _slice(params, self._names(key))
            fn = self._stage(key, mod)
            ca = fn.lower(pslice, *args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            total += float(ca.get("flops", 0.0)) if ca else 0.0
            return fn(pslice, *args)

        cfg = self.cfg
        ctx = encoder_hidden_states.astype(self.dtype)
        x, temb = run("stem", self._stem, sample, timesteps)
        skips = [x]
        for i, mod in enumerate(self._down):
            x, outs = run(f"down:{i}", mod, x, temb, ctx)
            skips.extend(outs)
        x = run("mid", self._mid, x, temb, ctx)
        for i, mod in enumerate(self._up):
            consume = tuple(skips.pop() for _ in range(cfg.layers_per_block + 1))
            x = run(f"up:{i}", mod, x, temb, ctx, consume)
        run("out", self._out, x)
        return total

    # -- input VJP (reconstruction-guided transfer) --------------------------
    def _ivjp_fn(self, key, mod, kind):
        """Per-stage VJP w.r.t. the stage's ACTIVATION inputs only (params,
        temb, ctx closed over as traced constants): roughly half the
        backward FLOPs of the training chain's param+input VJPs — guidance
        needs d(pred)/d(latent), never d(pred)/d(params)."""
        jkey = f"ivjp:{key}"
        if jkey not in self._jit:
            if kind == "stem":
                @jax.jit
                def f(pslice, args, ct_x):
                    sample, t = args
                    _, vjp = jax.vjp(
                        lambda s: mod.apply(pslice, s, t)[0], sample
                    )
                    (d_sample,) = vjp(ct_x)
                    return d_sample
            elif kind == "up":
                @jax.jit
                def f(pslice, args, ct_x):
                    x, temb, ctx, skips = args
                    _, vjp = jax.vjp(
                        lambda xx, ss: mod.apply(pslice, xx, temb, ctx, ss),
                        x, skips,
                    )
                    return vjp(ct_x)  # (d_x, d_skips)
            elif kind == "down":
                @jax.jit
                def f(pslice, args, cts):
                    x, temb, ctx = args
                    _, vjp = jax.vjp(
                        lambda xx: mod.apply(pslice, xx, temb, ctx), x
                    )
                    (d_x,) = vjp(cts)  # cts = (ct_x, outs_ct)
                    return d_x
            elif kind == "mid":
                @jax.jit
                def f(pslice, args, ct_x):
                    x, temb, ctx = args
                    _, vjp = jax.vjp(
                        lambda xx: mod.apply(pslice, xx, temb, ctx), x
                    )
                    (d_x,) = vjp(ct_x)
                    return d_x
            else:  # out
                @jax.jit
                def f(pslice, args, ct):
                    (x,) = args
                    _, vjp = jax.vjp(lambda xx: mod.apply(pslice, xx), x)
                    (d_x,) = vjp(ct)
                    return d_x

            self._jit[jkey] = f
        return self._jit[jkey]

    def forward_with_input_vjp(self, params, sample, timesteps,
                               encoder_hidden_states):
        """Forward pass + a ``vjp_fn(ct_pred) -> d_sample`` closure.

        The latent-cotangent chain for reconstruction-guided transfer
        (reference ``_custom_guided_generation``'s per-step
        ``torch.autograd.grad`` w.r.t. the latents,
        ``utils_Img2Img.py:701-760``) at widths whose monolithic grad
        program exceeds constrained compile transports: cotangents walk the
        stage programs out → up* → mid → down* → stem with the same skip
        routing as the training chain (train/segmented_train.py), but only
        activation inputs are differentiated.  temb/ctx cotangents are
        never materialized — neither depends on the latent, so they
        contribute nothing to d_sample."""
        cfg = self.cfg
        L = cfg.layers_per_block
        n = len(cfg.block_out_channels)
        ctx = encoder_hidden_states.astype(self.dtype)
        timesteps = jnp.asarray(timesteps)

        args_of = {}
        x, temb = self._stage("stem", self._stem)(
            _slice(params, self._names("stem")), sample, timesteps
        )
        skips = [x]
        down_out_count = {}
        for i, mod in enumerate(self._down):
            key = f"down:{i}"
            args_of[key] = (x, temb, ctx)
            x, outs = self._stage(key, mod)(
                _slice(params, self._names(key)), x, temb, ctx
            )
            skips.extend(outs)
            down_out_count[key] = len(outs)
        args_of["mid"] = (x, temb, ctx)
        x = self._stage("mid", self._mid)(
            _slice(params, self._names("mid")), x, temb, ctx
        )
        for i, mod in enumerate(self._up):
            key = f"up:{i}"
            cons = tuple(skips.pop() for _ in range(L + 1))
            args_of[key] = (x, temb, ctx, cons)
            x = self._stage(key, mod)(
                _slice(params, self._names(key)), x, temb, ctx, cons
            )
        assert not skips
        args_of["out"] = (x,)
        pred_raw = self._stage("out", self._out)(
            _slice(params, self._names("out")), x
        )

        def vjp_fn(ct_pred):
            ct = ct_pred.astype(pred_raw.dtype)
            ct_x = self._ivjp_fn("out", self._out, "out")(
                _slice(params, self._names("out")), args_of["out"], ct
            )
            skip_cts = []
            for i in reversed(range(n)):
                key = f"up:{i}"
                ct_x, d_skips = self._ivjp_fn(key, self._up[i], "up")(
                    _slice(params, self._names(key)), args_of[key], ct_x
                )
                # same stack-order bookkeeping as the training chain
                skip_cts = skip_cts + list(reversed(d_skips))
            ct_x = self._ivjp_fn("mid", self._mid, "mid")(
                _slice(params, self._names("mid")), args_of["mid"], ct_x
            )
            for i in reversed(range(n)):
                key = f"down:{i}"
                cnt = down_out_count[key]
                outs_ct = skip_cts[-cnt:]
                skip_cts = skip_cts[:-cnt]
                ct_x = self._ivjp_fn(key, self._down[i], "down")(
                    _slice(params, self._names(key)), args_of[key],
                    (ct_x, outs_ct),
                )
            (stem_skip_ct,) = skip_cts
            d_sample = self._ivjp_fn("stem", self._stem, "stem")(
                _slice(params, self._names("stem")), (sample, timesteps),
                ct_x + stem_skip_ct,
            )
            return d_sample.astype(ct_pred.dtype)

        return pred_raw.astype(sample.dtype), vjp_fn

    def __call__(self, params, sample, timesteps, encoder_hidden_states):
        cfg = self.cfg
        ctx = encoder_hidden_states.astype(self.dtype)
        x, temb = self._stage("stem", self._stem)(
            _slice(params, self._names("stem")), sample, timesteps
        )
        skips = [x]
        for i, mod in enumerate(self._down):
            x, outs = self._stage(f"down:{i}", mod)(
                _slice(params, self._names(f"down:{i}")), x, temb, ctx
            )
            skips.extend(outs)
        x = self._stage("mid", self._mid)(
            _slice(params, self._names("mid")), x, temb, ctx
        )
        for i, mod in enumerate(self._up):
            consume = tuple(
                skips.pop() for _ in range(cfg.layers_per_block + 1)
            )
            x = self._stage(f"up:{i}", mod)(
                _slice(params, self._names(f"up:{i}")), x, temb, ctx, consume
            )
        assert not skips
        out = self._stage("out", self._out)(
            _slice(params, self._names("out")), x
        )
        return out.astype(sample.dtype)
