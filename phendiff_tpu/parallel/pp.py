"""Pipeline parallelism: the segmented SD stage programs spread over devices.

The reference's only distribution story is DDP (SURVEY.md §2b); this is the
second TPU-native scale-up axis beyond data parallelism (`parallel/tp.py`
being the first).  `models/sd_segmented.py` already factors the SD UNet
into ~11 independently-jitted stage programs (stem, down blocks, mid, up
blocks, out) — exactly a pipeline.  Here each stage's parameter slice is
*resident on one device* and activations flow device-to-device between
stages, so a model too large for one chip's HBM runs across a slice
without the segmented path's single-chip memory gymnastics.

Scheduling is JAX's async dispatch, not a hand-written schedule: the host
loops microbatches through the stage chain in order and returns
immediately from every stage call; each device executes its per-stage work
queue as the inter-device transfers resolve, so microbatch m runs on stage
s while m+1 is still on s-1 — GPipe-style overlap for free, no bubbles
beyond the unavoidable fill/drain ones.  Transfers ride ICI on real
hardware (`jax.device_put` between committed devices).

Stage→device assignment is contiguous (`stage_devices`): neighbouring
stages share a device so an S-stage pipeline on D<S devices only pays
D-1 boundary transfers per microbatch, and the *skip* tensors (produced
by down stage i, consumed by up stage n-1-i) are moved once, lazily, at
consumption time.

This executor is forward-only (inference/eval/transfer — the headline
DDIB workload is 2·K forwards).  Pipeline-parallel *training* composes
the same placement with `train/segmented_train.py`'s per-stage VJP chain:
pass ``device_of=stage_devices(stage_keys(cfg), devices)`` to
``SegmentedSDTrainStep`` and place the state with its ``place_params`` —
gradients equal the single-device chain exactly
(tests/test_pp.py::test_pp_training_composes_with_vjp_chain).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp

from phendiff_tpu.models.sd_segmented import SegmentedSDUNet, _slice
from phendiff_tpu.models.sd_unet import SDUNetConfig


def stage_keys(cfg: SDUNetConfig) -> List[str]:
    """Topological stage order of the segmented UNet."""
    n = len(cfg.block_out_channels)
    return (
        ["stem"]
        + [f"down:{i}" for i in range(n)]
        + ["mid"]
        + [f"up:{i}" for i in range(n)]
        + ["out"]
    )


def stage_devices(
    keys: Sequence[str], devices: Sequence[jax.Device]
) -> Dict[str, jax.Device]:
    """Contiguous assignment: stage i of S onto device floor(i*D/S)."""
    S, D = len(keys), len(devices)
    return {k: devices[(i * D) // S] for i, k in enumerate(keys)}


class PipelinedSDUNet:
    """Callable drop-in for ``SDUNet.apply(params, x, t, ctx)`` executing
    the segmented stage programs as a device pipeline.

    Usage::

        pp = PipelinedSDUNet(cfg, devices=jax.devices())
        placed = pp.place_params(params)       # slices → their devices
        eps = pp(placed, latents, t, ctx, num_microbatches=4)
    """

    def __init__(
        self,
        cfg: SDUNetConfig,
        devices: Optional[Sequence[jax.Device]] = None,
        dtype=jnp.float32,
    ):
        self.cfg = cfg
        self.seg = SegmentedSDUNet(cfg, dtype)
        self.devices = list(devices if devices is not None else jax.devices())
        self.keys = stage_keys(cfg)
        self.device_of = stage_devices(self.keys, self.devices)

    # -- parameters ---------------------------------------------------------
    def init(self, rng, sample, timesteps, encoder_hidden_states):
        """Stage-by-stage init (bit-identical to the monolith, see
        SegmentedSDUNet.init), already placed onto the pipeline devices."""
        return self.place_params(
            self.seg.init(rng, sample, timesteps, encoder_hidden_states)
        )

    def place_params(self, params: Any) -> Dict[str, Any]:
        """Split a full param tree into per-stage slices, each committed to
        its stage's device.  Accepts either ``{"params": {...}}`` or an
        already-placed dict (idempotent)."""
        if "params" not in params:
            return params  # already per-stage
        return {
            k: jax.device_put(
                _slice(params, self.seg._names(k)), self.device_of[k]
            )
            for k in self.keys
        }

    # -- forward --------------------------------------------------------------
    def _to(self, key: str, *arrays):
        dev = self.device_of[key]
        return tuple(
            a if getattr(a, "devices", lambda: None)() == {dev}
            else jax.device_put(a, dev)
            for a in arrays
        )

    def _run_chunk(self, placed, sample, timesteps, ctx):
        seg, cfg = self.seg, self.cfg
        ctx = ctx.astype(seg.dtype)
        x, t = self._to("stem", sample, timesteps)
        x, temb = seg._stage("stem", seg._stem)(placed["stem"], x, t)
        skips = [("stem", x)]
        for i, mod in enumerate(seg._down):
            key = f"down:{i}"
            x, temb_d, ctx_d = self._to(key, x, temb, ctx)
            x, outs = seg._stage(key, mod)(placed[key], x, temb_d, ctx_d)
            skips.extend((key, o) for o in outs)
        x, temb_d, ctx_d = self._to("mid", x, temb, ctx)
        x = seg._stage("mid", seg._mid)(placed["mid"], x, temb_d, ctx_d)
        for i, mod in enumerate(seg._up):
            key = f"up:{i}"
            consume = tuple(
                self._to(key, skips.pop()[1])[0]
                for _ in range(cfg.layers_per_block + 1)
            )
            x, temb_d, ctx_d = self._to(key, x, temb, ctx)
            x = seg._stage(key, mod)(placed[key], x, temb_d, ctx_d, consume)
        assert not skips
        (x,) = self._to("out", x)
        out = seg._stage("out", seg._out)(placed["out"], x)
        return out.astype(sample.dtype)

    # -- input VJP (reconstruction-guided transfer under PP) -----------------
    def forward_with_input_vjp(
        self, placed, sample, timesteps, encoder_hidden_states
    ):
        """Forward + ``vjp_fn(ct_pred) -> d_sample`` with every stage's
        forward AND cotangent program resident on that stage's device.

        The guided transfer method (reference ``utils_Img2Img.py:651-760``,
        per-step ``torch.autograd.grad`` w.r.t. the latents) composed with
        pipeline placement: activations flow stem→…→out on the forward,
        cotangents walk out→…→stem on the same devices in reverse — each
        hop is one ICI transfer, mirroring how the training chain composes
        with ``device_of`` placement (test_pp.py::
        test_pp_training_composes_with_vjp_chain).  Numerics are exactly
        ``SegmentedSDUNet.forward_with_input_vjp`` (same per-stage
        programs, ``models/sd_segmented.py:352``): placement moves bits,
        never math."""
        placed = self.place_params(placed)
        seg, cfg = self.seg, self.cfg
        L = cfg.layers_per_block
        n = len(cfg.block_out_channels)
        ctx = encoder_hidden_states.astype(seg.dtype)
        in_dtype = sample.dtype
        # Both outputs (pred from the LAST stage, d_sample from the FIRST)
        # must land on ONE device: the guided head adds them to each other
        # and to the latents, and two differently-committed operands are a
        # hard error.  Home = the caller's committed device if any, else
        # the out stage's (where pred already lives).
        home = None
        if getattr(sample, "committed", False):
            home = next(iter(sample.devices()))
        if home is None:
            home = self.device_of["out"]

        args_of = {}
        x, t = self._to("stem", sample, jnp.asarray(timesteps))
        args_of["stem"] = (x, t)
        x, temb = seg._stage("stem", seg._stem)(placed["stem"], x, t)
        skips = [x]
        down_out_count = {}
        for i, mod in enumerate(seg._down):
            key = f"down:{i}"
            x, temb_d, ctx_d = self._to(key, x, temb, ctx)
            args_of[key] = (x, temb_d, ctx_d)
            x, outs = seg._stage(key, mod)(placed[key], x, temb_d, ctx_d)
            skips.extend(outs)
            down_out_count[key] = len(outs)
        x, temb_d, ctx_d = self._to("mid", x, temb, ctx)
        args_of["mid"] = (x, temb_d, ctx_d)
        x = seg._stage("mid", seg._mid)(placed["mid"], x, temb_d, ctx_d)
        for i, mod in enumerate(seg._up):
            key = f"up:{i}"
            cons = tuple(
                self._to(key, skips.pop())[0] for _ in range(L + 1)
            )
            x, temb_d, ctx_d = self._to(key, x, temb, ctx)
            args_of[key] = (x, temb_d, ctx_d, cons)
            x = seg._stage(key, mod)(placed[key], x, temb_d, ctx_d, cons)
        assert not skips
        (x,) = self._to("out", x)
        args_of["out"] = (x,)
        pred_raw = seg._stage("out", seg._out)(placed["out"], x)

        def vjp_fn(ct_pred):
            (ct,) = self._to("out", ct_pred.astype(pred_raw.dtype))
            ct_x = seg._ivjp_fn("out", seg._out, "out")(
                placed["out"], args_of["out"], ct
            )
            skip_cts = []
            for i in reversed(range(n)):
                key = f"up:{i}"
                (ct_x,) = self._to(key, ct_x)
                ct_x, d_skips = seg._ivjp_fn(key, seg._up[i], "up")(
                    placed[key], args_of[key], ct_x
                )
                # same stack-order bookkeeping as the single-chip chain
                skip_cts = skip_cts + list(reversed(d_skips))
            (ct_x,) = self._to("mid", ct_x)
            ct_x = seg._ivjp_fn("mid", seg._mid, "mid")(
                placed["mid"], args_of["mid"], ct_x
            )
            for i in reversed(range(n)):
                key = f"down:{i}"
                cnt = down_out_count[key]
                outs_ct = self._to(key, *skip_cts[-cnt:])
                skip_cts = skip_cts[:-cnt]
                (ct_x,) = self._to(key, ct_x)
                ct_x = seg._ivjp_fn(key, seg._down[i], "down")(
                    placed[key], args_of[key], (ct_x, list(outs_ct))
                )
            (stem_skip_ct,) = skip_cts
            ct_x, stem_skip_ct = self._to("stem", ct_x, stem_skip_ct)
            d_sample = seg._ivjp_fn("stem", seg._stem, "stem")(
                placed["stem"], args_of["stem"], ct_x + stem_skip_ct
            )
            return jax.device_put(d_sample.astype(ct_pred.dtype), home)

        return jax.device_put(pred_raw.astype(in_dtype), home), vjp_fn

    def __call__(
        self,
        placed,
        sample,
        timesteps,
        encoder_hidden_states,
        *,
        num_microbatches: int = 1,
    ):
        placed = self.place_params(placed)
        if num_microbatches <= 1:
            return self._run_chunk(
                placed, sample, timesteps, encoder_hidden_states
            )
        b = sample.shape[0]
        if b % num_microbatches:
            raise ValueError(
                f"batch {b} not divisible by num_microbatches={num_microbatches}"
            )
        m = b // num_microbatches
        t = jnp.broadcast_to(jnp.asarray(timesteps), (b,))
        # m-major dispatch: every stage call returns immediately (async),
        # so chunk k+1 enters stage 0 while chunk k is mid-pipeline.
        outs = [
            self._run_chunk(
                placed,
                sample[k * m:(k + 1) * m],
                t[k * m:(k + 1) * m],
                encoder_hidden_states[k * m:(k + 1) * m],
            )
            for k in range(num_microbatches)
        ]
        return jnp.concatenate(outs, axis=0)
