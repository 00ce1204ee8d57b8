"""InceptionV3 (FID variant) feature extractor in Flax.

The reference relies on torch-fidelity's pinned InceptionV3 (a TF-ported
checkpoint) for FID/ISC/KID (``environment.yaml:382``).  This is a faithful
JAX implementation of that architecture — pool3 (2048-d) features + the
1008-class logits head — with:

* module names matching the torch-fidelity checkpoint keys so
  ``load_torch_state_dict`` can convert the official weights 1:1 when a
  weights file is available (no network egress in this environment);
* the FID-specific pooling details (average pooling that excludes padding,
  max-pool instead of avg-pool in the last Mixed_7c branch);
* a deterministic random-init fallback (seed 0) when no weights file is
  given.  Random-feature FID is a random-projection distribution distance:
  it detects gross distribution differences, but with 2048 random
  projections over a few hundred samples its *ranking* of similar models
  is noisy — best-model selection on it is unreliable, absolute values
  are NOT comparable to published FID, and the Evaluator logs a loud
  warning whenever this fallback is active (metrics records carry
  ``inception_pretrained: 0.0``).  Set
  ``PHENDIFF_INCEPTION_WEIGHTS=/path/to/pt-or-safetensors`` for parity.

Input contract: NHWC float32 in [0, 1]; resized to 299x299 bilinear
(antialias, matching torch-fidelity's interpolation) inside ``prepare``.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

FEATURE_DIM = 2048
NUM_LOGITS = 1008


def _avg_pool_exclude_pad(x: Array, window: int, stride: int, pad: int) -> Array:
    """AvgPool with count_include_pad=False (the FID-Inception detail)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    counts = jax.lax.reduce_window(
        jnp.ones_like(x[..., :1]), 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )
    return summed / counts


def _max_pool(x: Array, window: int, stride: int, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


class BasicConv2d(nn.Module):
    """conv → BN(eps=1e-3, inference) → relu, named to match the checkpoint."""

    out_channels: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        x = nn.Conv(
            self.out_channels, self.kernel, strides=(self.stride, self.stride),
            padding=pad, use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_exclude_pad(x, 3, 1, 1)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7dbl_5")(bd)
        bp = _avg_pool_exclude_pad(x, 3, 1, 1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=[(0, 0), (3, 3)], name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=[(3, 3), (0, 0)], name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # Mixed_7b: avg; Mixed_7c (FID variant): max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=[(0, 0), (1, 1)], name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=[(1, 1), (0, 0)], name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_mode == "avg":
            bp = _avg_pool_exclude_pad(x, 3, 1, 1)
        else:
            bp = _max_pool(x, 3, 1, 1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Returns (pool3 features [B, 2048], logits [B, 1008])."""

    @nn.compact
    def __call__(self, x: Array):
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        features = jnp.mean(x, axis=(1, 2))  # global avg pool → [B, 2048]
        logits = nn.Dense(NUM_LOGITS, name="fc")(features)
        return features, logits


# ---------------------------------------------------------------------------
# Weight loading / extractor construction
# ---------------------------------------------------------------------------

WEIGHTS_ENV = "PHENDIFF_INCEPTION_WEIGHTS"
# Test knob: shrink the input resolution (breaks FID parity, 16x cheaper on
# a 1-core CPU; only meaningful with random-init weights).
RESIZE_ENV = "PHENDIFF_INCEPTION_RESIZE"


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch-fidelity / torchvision inception state dict to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() for k, v in sd.items()}


def convert_torch_weights(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torch state dict → flax variables {params, batch_stats}.

    Naming: our module path 'Mixed_5b/branch1x1/conv' ↔ torch key
    'Mixed_5b.branch1x1.conv.weight'; conv OIHW → HWIO; fc transposed.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(leaf)

    for key, val in sd.items():
        if key.startswith("AuxLogits."):
            # Real FID-Inception checkpoints carry the training-time auxiliary
            # classifier; it plays no part in feature extraction.
            continue
        parts = key.split(".")
        leaf = parts[-1]
        path = parts[:-1]
        if leaf == "weight" and parts[-2] == "conv":
            put(params, path + ["kernel"], np.transpose(val, (2, 3, 1, 0)))
        elif path and path[-1] == "fc" and leaf == "weight":
            put(params, path + ["kernel"], np.transpose(val))
        elif path and path[-1] == "fc" and leaf == "bias":
            put(params, path + ["bias"], val)
        elif leaf == "weight" and parts[-2] == "bn":
            put(params, path + ["scale"], val)
        elif leaf == "bias" and parts[-2] == "bn":
            put(params, path + ["bias"], val)
        elif leaf == "running_mean":
            put(stats, path + ["mean"], val)
        elif leaf == "running_var":
            put(stats, path + ["var"], val)
        elif leaf == "num_batches_tracked":
            continue
        else:
            raise ValueError(f"unrecognized checkpoint key: {key}")
    return {"params": params, "batch_stats": stats}


class InceptionExtractor:
    """Batched, jitted feature/logit extraction with resize-to-299."""

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        self.model = InceptionV3()
        weights_path = weights_path or os.environ.get(WEIGHTS_ENV)
        if weights_path:
            self.variables = convert_torch_weights(load_torch_state_dict(weights_path))
            self.pretrained = True
        else:
            dummy = jnp.zeros((1, 299, 299, 3))
            self.variables = self.model.init(jax.random.key(seed), dummy)
            self.pretrained = False
        self._apply = jax.jit(partial(self.model.apply, self.variables))

    def __call__(self, images01: Array):
        """images01: [B, H, W, 3] float in [0, 1] → (features, logits)."""
        b, h, w, _ = images01.shape
        x = images01.astype(jnp.float32)
        res = int(os.environ.get(RESIZE_ENV, "299"))
        if self.pretrained:
            res = 299  # never break parity with real weights
        if (h, w) != (res, res):
            x = jax.image.resize(x, (b, res, res, 3), method="bilinear")
        x = x * 2.0 - 1.0  # TF inception normalization
        return self._apply(x)

    def features_for(self, batches) -> Tuple[np.ndarray, np.ndarray]:
        """Consume an iterable of [B,H,W,3]-in-[0,1] arrays → (features, logits)."""
        feats, logits = [], []
        for batch in batches:
            f, l = self(jnp.asarray(batch))
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
        return np.concatenate(feats), np.concatenate(logits)
