"""Core utility tests: precision policy, RNG streams, mesh helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core.precision import Policy
from phendiff_tpu.core.rng import EVAL_SEED, KeyStream, make_streams
from phendiff_tpu.parallel import data_sharding, make_mesh, replicated


def test_policy_mapping():
    assert Policy.from_mixed_precision("no").compute_jnp == jnp.float32
    assert Policy.from_mixed_precision("bf16").compute_jnp == jnp.bfloat16
    # fp16 deliberately maps to bf16 on TPU
    assert Policy.from_mixed_precision("fp16").compute_jnp == jnp.bfloat16
    assert Policy.from_mixed_precision("bf16").param_jnp == jnp.float32
    with pytest.raises(ValueError):
        Policy.from_mixed_precision("int8")


def test_policy_cast_to_compute():
    p = Policy.from_mixed_precision("bf16")
    tree = {"w": jnp.ones(3, jnp.float32), "i": jnp.ones(3, jnp.int32)}
    out = p.cast_to_compute(tree)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32  # non-float leaves untouched


def test_key_streams_distinct_and_deterministic():
    s1 = make_streams(42)
    s2 = make_streams(42)
    a = s1["train"].next()
    b = s2["train"].next()
    np.testing.assert_array_equal(
        jax.random.key_data(a), jax.random.key_data(b)
    )
    c = s1["eval"].next()
    assert not np.array_equal(jax.random.key_data(a), jax.random.key_data(c))
    # successive draws differ
    d = s2["train"].next()
    assert not np.array_equal(jax.random.key_data(b), jax.random.key_data(d))


def test_eval_seed_matches_reference_constant():
    assert EVAL_SEED == 5742877512  # utils_training.py:698


def test_mesh_shapes_and_model_axis():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.devices.shape == (4, 2)
    with pytest.raises(ValueError):
        make_mesh(model_parallel=3)


def test_shardings():
    mesh = make_mesh()
    s = data_sharding(mesh, 4)
    assert s.spec[0] == "data" and s.spec[1] is None
    r = replicated(mesh)
    assert all(p is None for p in r.spec)
