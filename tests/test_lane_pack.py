"""Lane-packed execution must be a pure representation change: identical
param tree (names, shapes, init values) and equal outputs/gradients vs the
unpacked model — the packed kernels only add exact structural zeros to the
contraction (ops/lane_pack.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.models import CondUNet2D, UNet2DConfig
from phendiff_tpu.ops import lane_pack
from phendiff_tpu.ops.group_norm import group_norm


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 4 * 6 * 3).reshape(2, 4, 6, 3).astype(jnp.float32)
    p = lane_pack.pack(x)
    assert p.shape == (2, 4, 3, 6)
    np.testing.assert_array_equal(np.asarray(lane_pack.unpack(p)), np.asarray(x))


def test_packed_conv_matches_lax_conv():
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (2, 8, 8, 5))
    w = jax.random.normal(jax.random.key(1), (3, 3, 5, 7)) * 0.3
    b = jax.random.normal(jax.random.key(2), (7,))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn) + b
    got = lane_pack.unpack(
        lane_pack.packed_conv(lane_pack.pack(x), w, b, (5,))
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_conv_concat_sources():
    """Skip-concat: [x; skip] packed per-source must equal the true conv on
    the channel-concatenated tensor."""
    a = jax.random.normal(jax.random.key(0), (2, 8, 8, 6))
    s = jax.random.normal(jax.random.key(1), (2, 8, 8, 10))
    w = jax.random.normal(jax.random.key(2), (3, 3, 16, 4)) * 0.2
    cat = jnp.concatenate([a, s], axis=-1)
    dn = jax.lax.conv_dimension_numbers(cat.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(cat, w, (1, 1), "SAME", dimension_numbers=dn)
    packed_cat = jnp.concatenate([lane_pack.pack(a), lane_pack.pack(s)], axis=-1)
    got = lane_pack.unpack(lane_pack.packed_conv(packed_cat, w, None, (6, 10)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_downsample_matches():
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 6))
    w = jax.random.normal(jax.random.key(1), (3, 3, 6, 12)) * 0.2
    b = jnp.zeros((12,))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn
    )
    got = lane_pack.packed_downsample_conv(lane_pack.pack(x), w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_upsample_conv_matches():
    """Packed-output upsample conv == 2x nearest upsample + true 3x3 conv,
    viewed through pack() (only rounding differs: the parity kernel
    pre-adds the taps that hit a duplicated pixel)."""
    x = jax.random.normal(jax.random.key(0), (2, 4, 6, 5))
    w = jax.random.normal(jax.random.key(1), (3, 3, 5, 7)) * 0.3
    b = jax.random.normal(jax.random.key(2), (7,))
    bb, h, ww, c = x.shape
    u = jnp.broadcast_to(
        x[:, :, None, :, None, :], (bb, h, 2, ww, 2, c)
    ).reshape(bb, h * 2, ww * 2, c)
    dn = jax.lax.conv_dimension_numbers(u.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(u, w, (1, 1), "SAME", dimension_numbers=dn) + b
    got = lane_pack.unpack(lane_pack.packed_upsample_conv(x, w, b))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_group_norm_with_spanning_groups():
    """Groups that span a concat-source boundary (the flagship's 192-ch
    up-block norm with 32 groups) must match the unpacked statistics."""
    a = jax.random.normal(jax.random.key(0), (2, 8, 8, 24)) * 2.0 + 0.3
    s = jax.random.normal(jax.random.key(1), (2, 8, 8, 12)) * 0.5
    cat = jnp.concatenate([a, s], axis=-1)  # 36 ch, 4 groups of 9: spans at 24
    scale = jax.random.normal(jax.random.key(2), (36,))
    bias = jax.random.normal(jax.random.key(3), (36,))
    want = group_norm(cat, num_groups=4, eps=1e-5, scale=scale, bias=bias, act="silu")
    packed_cat = jnp.concatenate([lane_pack.pack(a), lane_pack.pack(s)], axis=-1)
    got = group_norm(
        packed_cat, num_groups=4, eps=1e-5, scale=scale, bias=bias, act="silu",
        packed=2, slot_channels=lane_pack.channel_of_slot((24, 12)),
    )
    # ground truth in the same packed layout: per-source packing of `want`
    want_packed = jnp.concatenate(
        [lane_pack.pack(want[..., :24]), lane_pack.pack(want[..., 24:])], axis=-1
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want_packed), rtol=1e-4, atol=1e-5
    )


CFG = UNet2DConfig(
    sample_size=16,
    block_out_channels=(12, 24),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=2,
    norm_num_groups=4,  # 36-ch up-concat norms get groups of 9 → spanning
    attention_head_dim=4,
    num_class_embeds=2,
)


def _models():
    base = CondUNet2D(CFG, dtype=jnp.float32)
    packed = CondUNet2D(CFG, dtype=jnp.float32, lane_pack=True)
    x = jax.random.normal(jax.random.key(0), (2, 16, 16, 3))
    t = jnp.array([3, 7], jnp.int32)
    labels = jnp.array([0, 1], jnp.int32)
    params = base.init(jax.random.key(42), x, t, class_labels=labels)
    return base, packed, params, x, t, labels


def test_lane_pack_identical_param_tree():
    base, packed, params, x, t, labels = _models()
    p2 = packed.init(jax.random.key(42), x, t, class_labels=labels)
    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(p2)[0]
    assert [p for p, _ in flat1] == [p for p, _ in flat2]
    for (path, a), (_, b) in zip(flat1, flat2):
        assert a.shape == b.shape, path
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(path))


def test_lane_pack_forward_equality():
    base, packed, params, x, t, labels = _models()
    want = base.apply(params, x, t, class_labels=labels)
    got = packed.apply(params, x, t, class_labels=labels)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_lane_pack_gradient_equality():
    base, packed, params, x, t, labels = _models()

    def loss(m):
        def f(p):
            out = m.apply(p, x, t, class_labels=labels)
            return jnp.mean(jnp.square(out))
        return f

    g1 = jax.grad(loss(base))(params)
    g2 = jax.grad(loss(packed))(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(g1)[0],
        jax.tree_util.tree_flatten_with_path(g2)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-6, err_msg=str(path)
        )


def test_lane_pack_flagship_config_forward():
    """super_small (the benchmark flagship) at a reduced 32px: the real
    packing pattern — level 0 packed, levels 1-2 unpacked."""
    from phendiff_tpu.models import config as C

    cfg = C.super_small().replace(sample_size=32)
    base = CondUNet2D(cfg, dtype=jnp.float32)
    packed = CondUNet2D(cfg, dtype=jnp.float32, lane_pack=True)
    x = jax.random.normal(jax.random.key(0), (2, 32, 32, 3))
    t = jnp.array([5, 9], jnp.int32)
    labels = jnp.array([0, 1], jnp.int32)
    params = base.init(jax.random.key(1), x, t, class_labels=labels)
    want = base.apply(params, x, t, class_labels=labels)
    got = packed.apply(params, x, t, class_labels=labels)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5
    )


def test_lane_pack_odd_width_disables():
    cfg = CFG.replace(sample_size=18)  # 18 → level1 width 9: odd
    packed = CondUNet2D(cfg, dtype=jnp.float32, lane_pack=True)
    x = jax.random.normal(jax.random.key(0), (1, 18, 18, 3))
    params = packed.init(
        jax.random.key(1), x, jnp.array([0]), class_labels=jnp.array([0])
    )
    out = packed.apply(params, x, jnp.array([0]), class_labels=jnp.array([0]))
    assert out.shape == (1, 18, 18, 3)
