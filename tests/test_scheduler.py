"""Scheduler math tests: algebraic identities, spacing, round-trip parity.

The reference delegates all of this to diffusers' DDIMScheduler /
DDIMInverseScheduler; here the math is ours, so we verify it from first
principles plus the properties the reference relies on (SURVEY.md §7
"hard parts": spacing, zero-SNR, set_alpha_to_one, inversion round-trip).
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core import scheduler as S

CONFIG_DIR = pathlib.Path(__file__).resolve().parents[1] / "configs" / "noise_scheduler"


def make(**kw):
    return S.make_schedule(S.SchedulerConfig(**kw))


def test_beta_schedules_monotone():
    for bs in ("linear", "scaled_linear", "squaredcos_cap_v2"):
        sched = make(beta_schedule=bs, num_train_timesteps=100)
        acp = np.asarray(sched.alphas_cumprod)
        assert acp.shape == (100,)
        assert np.all(np.diff(acp) < 0), bs
        assert acp[0] < 1.0 and acp[-1] > 0.0


def test_scaled_linear_matches_formula():
    cfg = S.SchedulerConfig(
        beta_schedule="scaled_linear", beta_start=0.0001, beta_end=0.02,
        num_train_timesteps=1000,
    )
    sched = S.make_schedule(cfg)
    betas = np.linspace(0.0001**0.5, 0.02**0.5, 1000) ** 2
    expected = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), expected, rtol=1e-5)


def test_zero_snr_rescale_terminal_alpha_is_zero():
    sched = make(rescale_betas_zero_snr=True)
    acp = np.asarray(sched.alphas_cumprod)
    assert acp[-1] == pytest.approx(0.0, abs=1e-12)
    # first alpha preserved
    ref = make(rescale_betas_zero_snr=False)
    assert acp[0] == pytest.approx(float(ref.alphas_cumprod[0]), rel=1e-5)


def test_final_alpha_cumprod_modes():
    assert float(make(set_alpha_to_one=True).final_alpha_cumprod) == 1.0
    s = make(set_alpha_to_one=False)
    assert float(s.final_alpha_cumprod) == pytest.approx(
        float(s.alphas_cumprod[0])
    )


@pytest.mark.parametrize("spacing", ["leading", "trailing", "linspace"])
def test_inference_timesteps_shapes(spacing):
    cfg = S.SchedulerConfig(timestep_spacing=spacing, num_train_timesteps=1000)
    ts = S.inference_timesteps(cfg, 50)
    assert ts.shape == (50,)
    assert np.all(np.diff(ts) < 0)  # descending
    assert ts.min() >= 0 and ts.max() < 1000
    if spacing == "trailing":
        assert ts[0] == 999  # trailing always includes the terminal step


def test_leading_spacing_with_offset():
    cfg = S.SchedulerConfig(timestep_spacing="leading", steps_offset=1)
    ts = S.inference_timesteps(cfg, 50)
    assert ts[-1] == 1  # 0*20 + offset
    assert ts[0] == 49 * 20 + 1


def test_timestep_pairs_and_frac_skip():
    cfg = S.SchedulerConfig(timestep_spacing="trailing")
    ts, tp = S.timestep_pairs(cfg, 50)
    assert tp[-1] == -1
    np.testing.assert_array_equal(ts[1:], tp[:-1])
    # frac skip keeps only the low-noise tail (reference: ts <= T*(1-frac))
    ts2, _ = S.timestep_pairs(cfg, 50, frac_diffusion_skipped=0.5)
    assert ts2.max() <= 500
    assert len(ts2) < len(ts)


def test_inversion_pairs_are_reverse_of_generation():
    cfg = S.SchedulerConfig()
    g_t, g_prev = S.timestep_pairs(cfg, 10)
    i_t, i_next = S.inversion_timestep_pairs(cfg, 10)
    np.testing.assert_array_equal(i_t, g_prev[::-1])
    np.testing.assert_array_equal(i_next, g_t[::-1])


def test_add_noise_limits():
    sched = make()
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 2.0)
    # t=0: nearly clean
    near = S.add_noise(sched, x0, noise, jnp.array([0, 0]))
    a0 = float(sched.alphas_cumprod[0])
    assert float(near[0, 0, 0, 0]) == pytest.approx(
        np.sqrt(a0) + np.sqrt(1 - a0) * 2.0, rel=1e-5
    )
    # per-sample timesteps broadcast
    mixed = S.add_noise(sched, x0, noise, jnp.array([0, 999]))
    assert not np.allclose(mixed[0], mixed[1])


def test_velocity_identity():
    # Algebra: sqrt(a)*v + sqrt(1-a)*x_t == eps  where x_t = add_noise(x0)
    sched = make()
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (3, 8, 8, 2))
    noise = jax.random.normal(jax.random.key(1), (3, 8, 8, 2))
    t = jnp.array([10, 500, 990])
    xt = S.add_noise(sched, x0, noise, t)
    v = S.velocity(sched, x0, noise, t)
    a = sched.alphas_cumprod[t].reshape(-1, 1, 1, 1)
    eps_back = jnp.sqrt(a) * v + jnp.sqrt(1 - a) * xt
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(noise), atol=1e-5)


@pytest.mark.parametrize("pt", ["epsilon", "sample", "v_prediction"])
def test_predict_x0_eps_consistency(pt):
    """Whatever the parameterization, recovering (x0, eps) from the exact
    target must return the true (x0, eps)."""
    sched = make(prediction_type=pt, clip_sample=False)
    x0 = jax.random.normal(jax.random.key(2), (2, 4, 4, 1))
    noise = jax.random.normal(jax.random.key(3), (2, 4, 4, 1))
    t = jnp.array([100, 800])
    xt = S.add_noise(sched, x0, noise, t)
    if pt == "epsilon":
        model_out = noise
    elif pt == "sample":
        model_out = x0
    else:
        model_out = S.velocity(sched, x0, noise, t)
    px0, peps = S.predict_x0_eps(sched, model_out, t, xt)
    np.testing.assert_allclose(np.asarray(px0), np.asarray(x0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(peps), np.asarray(noise), atol=1e-4)


def test_ddim_step_perfect_model_recovers_x0():
    """With a perfect epsilon oracle, DDIM (eta=0) maps x_t exactly to the
    correctly-noised x_{t_prev} at every step, ending at x0."""
    sched = make(clip_sample=False)
    x0 = jax.random.normal(jax.random.key(4), (2, 8, 8, 3))
    noise = jax.random.normal(jax.random.key(5), (2, 8, 8, 3))
    ts, tps = S.timestep_pairs(sched.config, 10)
    x = S.add_noise(sched, x0, noise, jnp.array(ts[0]))
    for t, tp in zip(ts, tps):
        x = S.ddim_step(sched, noise, jnp.array(t), jnp.array(tp), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_inversion_round_trip_exact_for_linear_model():
    """For a model whose output is constant in x (so the ODE discretization
    is exact), inversion followed by generation is an exact round trip."""
    sched = make(clip_sample=False)
    x0 = jax.random.normal(jax.random.key(6), (1, 8, 8, 3)) * 0.3
    eps_const = jax.random.normal(jax.random.key(7), (1, 8, 8, 3))

    inv_t, inv_next = S.inversion_timestep_pairs(sched.config, 20)
    x = x0
    for t, tn in zip(inv_t, inv_next):
        x = S.ddim_inverse_step(sched, eps_const, jnp.array(t), jnp.array(tn), x)

    gen_t, gen_prev = S.timestep_pairs(sched.config, 20)
    for t, tp in zip(gen_t, gen_prev):
        x = S.ddim_step(sched, eps_const, jnp.array(t), jnp.array(tp), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ddim_step_eta_stochastic():
    sched = make(clip_sample=False)
    x = jax.random.normal(jax.random.key(8), (1, 4, 4, 1))
    eps = jax.random.normal(jax.random.key(9), (1, 4, 4, 1))
    z = jax.random.normal(jax.random.key(10), (1, 4, 4, 1))
    a = S.ddim_step(sched, eps, jnp.array(500), jnp.array(480), x, eta=1.0, noise=z)
    b = S.ddim_step(sched, eps, jnp.array(500), jnp.array(480), x, eta=0.0)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError):
        S.ddim_step(sched, eps, jnp.array(500), jnp.array(480), x, eta=1.0)


def test_clip_sample_applies():
    sched = make(clip_sample=True, clip_sample_range=1.0)
    x = jnp.full((1, 2, 2, 1), 50.0)
    eps = jnp.zeros((1, 2, 2, 1))
    out = S.ddim_step(sched, eps, jnp.array(999), jnp.array(-1), x)
    # t_prev=-1 → x_out = x0 clipped to [-1, 1]
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6


def test_thresholding_dynamic():
    sched = make(clip_sample=False, thresholding=True, sample_max_value=1.0)
    x0 = jnp.concatenate(
        [jnp.full((1, 1, 1, 8), 3.0), jnp.full((1, 1, 1, 8), -0.5)], axis=-1
    )
    out = S._maybe_clip_x0(sched, x0)
    assert np.abs(np.asarray(out)).max() <= 1.0 + 1e-6


def test_config_json_roundtrip_and_reference_configs():
    # our shipped configs mirror the reference scheduler configs
    for p in sorted(CONFIG_DIR.glob("*.json")):
        cfg = S.SchedulerConfig.from_json(p)
        sched = S.make_schedule(cfg)
        assert sched.alphas_cumprod.shape[0] == cfg.num_train_timesteps
        d = cfg.to_json_dict()
        cfg2 = S.SchedulerConfig.from_json(d)
        assert cfg == cfg2
    assert len(list(CONFIG_DIR.glob("*.json"))) >= 4


def test_unknown_config_key_raises():
    with pytest.raises(ValueError):
        S.SchedulerConfig.from_json({"definitely_not_a_key": 1})


def test_steps_in_jit_and_scan():
    """The step functions must trace cleanly inside jit + scan."""
    sched = make(clip_sample=False)
    ts, tps = S.timestep_pairs(sched.config, 10)
    pairs = jnp.stack([jnp.asarray(ts), jnp.asarray(tps)], axis=1)

    @jax.jit
    def sample(x, eps):
        def body(x, pair):
            t, tp = pair[0], pair[1]
            return S.ddim_step(sched, eps, t, tp, x), None

        out, _ = jax.lax.scan(body, x, pairs)
        return out

    x = jax.random.normal(jax.random.key(11), (2, 8, 8, 3))
    eps = jnp.zeros_like(x)
    out = sample(x, eps)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
