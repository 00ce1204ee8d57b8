"""Numeric validation of the InceptionV3 weight converter against torch.

The reference's FID/ISC/KID numbers come from torch-fidelity's pinned
FID-Inception executed by torch (``/root/reference/src/utils_training.py:975-988``).
``convert_torch_weights`` maps that checkpoint layout onto our Flax graph;
this test proves the mapping end to end with an INDEPENDENT torch-side
execution: a minimal torch implementation of the same FID-Inception graph
(torch's own conv/BN/pool kernels as the oracle) is initialized randomly,
its ``state_dict()`` — whose keys are exactly the torch-fidelity
checkpoint key space — is run through the converter, and pool3 features +
logits must match between torch and Flax.

The torch mirror below encodes the documented FID-Inception deviations
from stock InceptionV3 (torch-fidelity / pytorch-fid lineage): avg-pools
with ``count_include_pad=False`` in the A/C/E blocks, a max-pool in
Mixed_7c's pool branch, and a 1008-way fc.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax.numpy as jnp

from phendiff_tpu.metrics.inception import InceptionV3, convert_torch_weights


class TBasic(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x):
    return F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class TA(tnn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = TBasic(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasic(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasic(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasic(cin, pool, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x)),
        ], 1)


class TB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasic(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasic(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasic(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = TBasic(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasic(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = TBasic(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = TBasic(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = TBasic(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = TBasic(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = TBasic(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = TBasic(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(self.branch7x7dbl_3(self.branch7x7dbl_2(bd)))
        )
        return torch.cat(
            [self.branch1x1(x), b7, bd, self.branch_pool(_avg(x))], 1
        )


class TD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasic(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasic(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasic(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasic(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = TBasic(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = TBasic(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(
                self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
            ),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TE(tnn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = TBasic(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasic(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = TBasic(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasic(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = TBasic(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = TBasic(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = TBasic(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "avg":
            bp = _avg(x)
        else:
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(bp)], 1)


class TInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasic(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasic(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasic(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasic(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasic(80, 192, kernel_size=3)
        self.Mixed_5b = TA(192, 32)
        self.Mixed_5c = TA(256, 64)
        self.Mixed_5d = TA(288, 64)
        self.Mixed_6a = TB(288)
        self.Mixed_6b = TC(768, 128)
        self.Mixed_6c = TC(768, 160)
        self.Mixed_6d = TC(768, 160)
        self.Mixed_6e = TC(768, 192)
        self.Mixed_7a = TD(768)
        self.Mixed_7b = TE(1280, "avg")
        self.Mixed_7c = TE(2048, "max")
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
                     "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
                     "Mixed_7c"):
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        return feats, self.fc(feats)


def test_converted_weights_reproduce_torch_features():
    torch.manual_seed(0)
    tmodel = TInception().eval()
    # perturb BN running stats away from the (0, 1) init so the stats
    # conversion path is actually load-bearing
    with torch.no_grad():
        for m in tmodel.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)

    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    # real checkpoints additionally carry the aux classifier — must be skipped
    sd["AuxLogits.conv0.conv.weight"] = np.zeros((128, 768, 1, 1), np.float32)
    sd["AuxLogits.conv0.bn.running_mean"] = np.zeros((128,), np.float32)
    variables = convert_torch_weights(sd)

    x = np.random.default_rng(1).uniform(-1, 1, (2, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        tf_, tl_ = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))

    jf, jl = InceptionV3().apply(variables, jnp.asarray(x))

    np.testing.assert_allclose(np.asarray(jf), tf_.numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(jl), tl_.numpy(), rtol=2e-3, atol=2e-3)


def test_converter_shape_manifest_matches_flax_init():
    """Every converted leaf must land on a Flax param of identical shape —
    catches silent transposition/renaming drift without needing weights."""
    import jax

    tmodel = TInception()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    converted = convert_torch_weights(sd)
    ref = InceptionV3().init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))

    conv_flat = jax.tree_util.tree_leaves_with_path(converted)
    ref_flat = dict(jax.tree_util.tree_leaves_with_path(ref))
    assert len(conv_flat) == len(ref_flat)
    for path, leaf in conv_flat:
        assert path in ref_flat, f"converted key not in model: {path}"
        assert leaf.shape == ref_flat[path].shape, (
            f"shape mismatch at {path}: {leaf.shape} vs {ref_flat[path].shape}"
        )
