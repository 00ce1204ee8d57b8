"""Tensor parallelism (model-axis sharding) for the UNet families.

The reference has no tensor parallelism at all — its only distribution
story is HF Accelerate DDP (SURVEY.md §2b).  This module is the TPU-native
scale-up path beyond data parallelism: shard the *parameters* over the
``model`` mesh axis, let GSPMD propagate activation shardings and insert
the collectives (all-gather / reduce-scatter / psum) on ICI.  No hand
collectives anywhere — the scaling-book recipe: pick a mesh, annotate
shardings, let XLA do the rest.

Scheme (Megatron-style pairs where the graph has them, output-channel
parallelism otherwise), keyed purely on parameter *names* so the same
rules cover ``CondUNet2D``, ``SDUNet``, their optimizer-moment trees and
EMA copies:

* attention projections — ``qkv`` / ``to_q`` / ``to_k`` / ``to_v`` are
  column-parallel (output dim sharded: heads split across devices);
  ``proj_out`` / ``to_out`` are row-parallel (input dim sharded).  One
  psum per attention block, inserted by XLA at the row matmul.
* feed-forward — GEGLU ``proj_in`` column (the 8c expansion is the big
  matmul), ``proj_out`` row.
* resnet blocks — ``conv1`` output-channel sharded, ``conv2``
  input-channel sharded: the pair keeps the wide intermediate sharded
  through the in-between GroupNorm (channels-per-device stay a multiple
  of the group size for the standard 32-group configs) and costs one
  psum at ``conv2``.  ``conv_in`` and the down/upsample ``conv``s are
  output-channel sharded; ``conv_shortcut`` / ``conv_out`` (tiny or
  odd-width) and all 1-D params (norm scales/biases, biases) replicate —
  elementwise ops against a sharded activation slice the replicated
  operand for free.
* embeddings / time MLP — replicated (tiny, used by every shard).

Any dimension not divisible by the model-axis size falls back to
replication (GSPMD keeps numerics identical either way; the rules only
steer communication volume).

Caveats, documented rather than hidden:

* a bare pallas_call has no GSPMD partitioning rule, so the fused
  attention kernel runs under ``shard_map`` in tensor-parallel programs
  (heads over the model axis, batch over data — no collectives; see
  ``ops/attention.set_tp_mesh``, registered automatically by the
  Trainer).  Shapes that don't divide the mesh fall back to XLA
  attention, which partitions under any sharding;
* ``CondUNet2D``'s fused ``qkv`` emits q|k|v concatenated, so its column
  shards straddle the q/k/v split points and GSPMD reshards around
  ``jnp.split`` — the SD UNet (separate ``to_q/to_k/to_v``) has no such
  seam;
* lane-packed execution (``ops/lane_pack.py``) is a single-chip
  minor-dim-utilization optimization; at TP width the channel dim is
  sharded instead — construct models with ``lane_pack=False`` under TP.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phendiff_tpu.parallel.mesh import MODEL_AXIS

# Dense kernels are [in, out]; conv kernels are [kh, kw, in, out].
_COLUMN_DENSE = {"qkv", "to_q", "to_k", "to_v", "proj_in"}
_ROW_DENSE = {"to_out", "proj_out"}
_COLUMN_CONV = {"conv1", "conv_in", "conv"}  # "conv" = down/upsample convs
_ROW_CONV = {"conv2"}


def _dict_path_names(path) -> tuple:
    return tuple(
        e.key for e in path if isinstance(e, jax.tree_util.DictKey)
    )


def tp_spec(path_names, shape, tp_size: int, axis: str = MODEL_AXIS) -> P:
    """PartitionSpec for one parameter, by its tree path and shape."""
    if tp_size <= 1 or not shape:
        return P()
    names = tuple(path_names)
    leaf = names[-1] if names else ""
    owner = names[-2] if len(names) >= 2 else ""
    if leaf != "kernel":
        return P()  # biases, norms, embeddings: replicated
    ndim = len(shape)
    if ndim == 2:
        if owner in _COLUMN_DENSE and shape[1] % tp_size == 0:
            return P(None, axis)
        if owner in _ROW_DENSE and shape[0] % tp_size == 0:
            return P(axis, None)
        return P()
    if ndim == 4:
        if owner in _ROW_CONV and shape[2] % tp_size == 0:
            return P(None, None, axis, None)
        if owner in _COLUMN_CONV and shape[3] % tp_size == 0:
            return P(None, None, None, axis)
        return P()
    return P()


def _model_axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis] if axis in mesh.shape else 1


def tp_shardings(tree: Any, mesh: Mesh, axis: str = MODEL_AXIS):
    """NamedSharding pytree for any params-shaped tree (params, EMA, or
    optax moment trees — the rules key on dict-path names, which optax's
    mu/nu trees preserve)."""
    tp = _model_axis_size(mesh, axis)

    def one(path, leaf):
        shape = getattr(leaf, "shape", ())
        return NamedSharding(
            mesh, tp_spec(_dict_path_names(path), shape, tp, axis)
        )

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_params(params: Any, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place a param tree onto the mesh with tensor-parallel shardings."""
    return jax.device_put(params, tp_shardings(params, mesh, axis))


def shard_train_state(state: Any, mesh: Mesh, axis: str = MODEL_AXIS):
    """Place a TrainState (params + opt moments + EMA + scalars) onto the
    mesh: every array whose tree path matches a TP rule gets the model-axis
    sharding, everything else (scalars, schedule counts) replicates."""
    return jax.device_put(state, tp_shardings(state, mesh, axis))


def describe(tree: Any, mesh: Mesh, axis: str = MODEL_AXIS) -> str:
    """Human-readable table of the non-replicated shardings (debugging)."""
    tp = _model_axis_size(mesh, axis)
    lines = []

    def one(path, leaf):
        spec = tp_spec(
            _dict_path_names(path), getattr(leaf, "shape", ()), tp, axis
        )
        if any(s is not None for s in spec):
            lines.append(
                f"{jax.tree_util.keystr(path)}  {tuple(leaf.shape)}  {spec}"
            )
        return leaf

    jax.tree_util.tree_map_with_path(one, tree)
    return "\n".join(lines)
