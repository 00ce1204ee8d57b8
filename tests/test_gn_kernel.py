"""Fused GroupNorm Pallas kernel tests (interpret mode on CPU)."""

import os

os.environ["PHENDIFF_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.ops.gn_kernels import _reference_gn, fused_group_norm
from phendiff_tpu.ops.group_norm import group_norm


def _data(b=2, s=16, c=8, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, s, c), dtype=np.float32))
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    return x, scale, bias


@pytest.mark.parametrize("act", [None, "silu"])
def test_kernel_matches_reference(act):
    x, scale, bias = _data()
    out = fused_group_norm(x, scale, bias, num_groups=4, eps=1e-5, act=act)
    ref = _reference_gn(x, scale, bias, 4, 1e-5, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_matches_group_norm_op():
    x, scale, bias = _data(b=1, s=4, c=8, seed=1)
    out = fused_group_norm(x, scale, bias, num_groups=2, eps=1e-6, act="silu")
    ref = group_norm(
        x.reshape(1, 2, 2, 8), num_groups=2, eps=1e-6,
        scale=scale, bias=bias, act="silu",
    ).reshape(1, 4, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_grad_matches_reference():
    x, scale, bias = _data(seed=2)

    def loss_fused(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, num_groups=4, eps=1e-5,
                                        act="silu") ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_reference_gn(x, s, b, 4, 1e-5, "silu") ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bf16_input_f32_output():
    x, scale, bias = _data(seed=3)
    out = fused_group_norm(
        x.astype(jnp.bfloat16), scale, bias, num_groups=4, eps=1e-5
    )
    assert out.dtype == jnp.float32
