"""Op tests: XLA attention vs naive math, Pallas kernel (interpret mode)
vs XLA, GroupNorm vs reference math."""

import os

os.environ["PHENDIFF_PALLAS_INTERPRET"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.ops.attention import attention_xla, multi_head_attention
from phendiff_tpu.ops.group_norm import group_norm


def _naive_attention(q, k, v):
    d = q.shape[-1]
    scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
    scores = scores - scores.max(axis=-1, keepdims=True)
    p = np.exp(scores)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", p, v)


def test_attention_xla_matches_naive():
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((2, 16, 4, 8), dtype=np.float32) for _ in range(3))
    out = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), _naive_attention(q, k, v), atol=1e-5)


def test_flash_attention_matches_xla_interpret():
    from phendiff_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(1)
    q, k, v = (rng.standard_normal((1, 128, 2, 8), dtype=np.float32) for _ in range(3))
    ref = attention_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    out = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_flash_attention_grad_matches_xla():
    from phendiff_tpu.ops.flash_attention import flash_attention

    rng = np.random.default_rng(2)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 128, 1, 8), dtype=np.float32))
        for _ in range(3)
    )

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(attention_xla(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_multi_head_attention_dispatch_explicit():
    rng = np.random.default_rng(3)
    q, k, v = (rng.standard_normal((1, 64, 2, 8), dtype=np.float32) for _ in range(3))
    a = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), implementation="xla"
    )
    b = multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), implementation="pallas"
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    with pytest.raises(ValueError):
        multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), implementation="bogus"
        )


def test_group_norm_matches_manual():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 4, 4, 8), dtype=np.float32)
    scale = rng.standard_normal(8).astype(np.float32)
    bias = rng.standard_normal(8).astype(np.float32)
    out = group_norm(
        jnp.asarray(x), num_groups=2, eps=1e-5,
        scale=jnp.asarray(scale), bias=jnp.asarray(bias),
    )
    # manual: split channels into 2 groups of 4, normalize over (H,W,Cg)
    xg = x.reshape(2, 4, 4, 2, 4)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    ref = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(2, 4, 4, 8)
    ref = ref * scale + bias
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_group_norm_silu_fused():
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 2, 2, 4), dtype=np.float32))
    plain = group_norm(x, num_groups=2, eps=1e-5)
    fused = group_norm(x, num_groups=2, eps=1e-5, act="silu")
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(jax.nn.silu(plain)), atol=1e-6
    )


def test_group_norm_bad_groups():
    with pytest.raises(ValueError):
        group_norm(jnp.zeros((1, 2, 2, 6)), num_groups=4, eps=1e-5)


def test_flash_attention_multiblock_backward_matches_xla():
    """Exercises the dk/dv VMEM-accumulator path (several q-blocks)."""
    import jax

    rng = np.random.default_rng(7)
    q, k, v = (
        jnp.asarray(rng.standard_normal((1, 1024, 2, 8), dtype=np.float32))
        for _ in range(3)
    )
    from phendiff_tpu.ops.flash_attention import flash_attention

    gf = jax.grad(
        lambda a, b, c: jnp.sum(flash_attention(a, b, c) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    gx = jax.grad(
        lambda a, b, c: jnp.sum(attention_xla(a, b, c) ** 2), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-3, err_msg=name
        )
