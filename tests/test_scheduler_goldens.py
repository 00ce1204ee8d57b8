"""Numeric parity vs vendored float64 goldens of the diffusers step semantics.

The fixtures (``tests/fixtures/scheduler_goldens.json``) are produced by
``tools/gen_scheduler_goldens.py`` — an independent float64 NumPy
implementation of the DDIMScheduler / DDIMInverseScheduler equations the
reference uses (``/root/reference/src/utils_models.py:186-245``,
``utils_Img2Img.py:776-798``) — for all four shipped scheduler configs
(zero-SNR rescale, trailing + leading spacing, steps_offset,
set_alpha_to_one=False, epsilon/v prediction, eta>0, clipped model output).

This closes the "matched per-step numerics" gate from BASELINE.md: the
fixtures cannot co-evolve with ``phendiff_tpu.core.scheduler`` because they
never import it.
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from phendiff_tpu.core.scheduler import (
    SchedulerConfig,
    _make_betas,
    _rescale_zero_terminal_snr,
    ddim_inverse_step,
    ddim_step,
    inference_timesteps,
    make_schedule,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "scheduler_goldens.json")

with open(FIXTURE) as f:
    GOLDENS = json.load(f)

CONFIG_NAMES = sorted(GOLDENS["configs"].keys())
SAMPLE = np.asarray(GOLDENS["inputs"]["sample"], np.float64)
MODEL_OUTPUT = np.asarray(GOLDENS["inputs"]["model_output"], np.float64)
NOISE = np.asarray(GOLDENS["inputs"]["noise"], np.float64)


def _config(name) -> SchedulerConfig:
    return SchedulerConfig.from_json(GOLDENS["configs"][name]["config"])


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_alpha_cumprod_table_matches_float64_golden(name):
    entry = GOLDENS["configs"][name]
    cfg = _config(name)
    # exact f64 construction parity (host-side tables before the f32 cast)
    betas = _make_betas(cfg)
    ac = np.cumprod(1.0 - betas)
    if cfg.rescale_betas_zero_snr:
        ac = _rescale_zero_terminal_snr(ac)
    for t_str, want in entry["alphas_cumprod_probe"].items():
        np.testing.assert_allclose(ac[int(t_str)], want, rtol=1e-12, atol=1e-15)
    # and the schedule actually carried into jit (f32)
    sched = make_schedule(cfg)
    for t_str, want in entry["alphas_cumprod_probe"].items():
        np.testing.assert_allclose(
            float(sched.alphas_cumprod[int(t_str)]), want, rtol=2e-6, atol=1e-9
        )
    np.testing.assert_allclose(
        float(sched.final_alpha_cumprod), entry["final_alpha_cumprod"], rtol=2e-6
    )


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_inference_timesteps_match_diffusers_spacing(name):
    entry = GOLDENS["configs"][name]
    cfg = _config(name)
    for n_str, want in entry["timesteps"].items():
        got = inference_timesteps(cfg, int(n_str))
        np.testing.assert_array_equal(got, np.asarray(want, np.int64))


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_ddim_step_matches_float64_golden(name):
    entry = GOLDENS["configs"][name]
    sched = make_schedule(_config(name))
    sample = jnp.asarray(SAMPLE, jnp.float32)
    model_output = jnp.asarray(MODEL_OUTPUT, jnp.float32)
    noise = jnp.asarray(NOISE, jnp.float32)
    for case in entry["steps"]:
        got = ddim_step(
            sched,
            model_output,
            jnp.asarray(case["t"]),
            jnp.asarray(case["t_prev"]),
            sample,
            eta=case["eta"],
            noise=noise if case["eta"] > 0 else None,
            use_clipped_model_output=case["use_clipped_model_output"],
        )
        want = np.asarray(case["prev_sample"], np.float64)
        # f32 evaluation against f64 goldens; coefficient cancellation near
        # alpha→0 (zero-SNR tails) costs a few ulps more than elsewhere.
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=5e-4, atol=5e-5,
            err_msg=f"{name} step case {case['t']}→{case['t_prev']} "
                    f"eta={case['eta']} clipped={case['use_clipped_model_output']}",
        )


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_ddim_inverse_step_matches_float64_golden(name):
    entry = GOLDENS["configs"][name]
    sched = make_schedule(_config(name))
    sample = jnp.asarray(SAMPLE, jnp.float32)
    model_output = jnp.asarray(MODEL_OUTPUT, jnp.float32)
    for case in entry["inverse_steps"]:
        got = ddim_inverse_step(
            sched,
            model_output,
            jnp.asarray(case["t"]),
            jnp.asarray(case["t_next"]),
            sample,
        )
        want = np.asarray(case["next_sample"], np.float64)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), want, rtol=5e-4, atol=5e-5,
            err_msg=f"{name} inverse case {case['t']}→{case['t_next']}",
        )


def test_pair_stepping_equals_diffusers_derived_prev_when_divisible():
    """Our explicit (t, t_prev) pairs equal diffusers' derived
    ``t - T//n`` on every shipped config at n=50 and n=10 (n | T), so the
    two stepping schemes traverse identical (alpha_t, alpha_prev) ladders."""
    for name in CONFIG_NAMES:
        cfg = _config(name)
        for n in (50, 10):
            ts = inference_timesteps(cfg, n)
            derived_prev = ts - cfg.num_train_timesteps // n
            # interior pairs: derived == actual next element
            np.testing.assert_array_equal(derived_prev[:-1], ts[1:])
            # terminal pair: both sides land below 0 → final_alpha_cumprod
            assert derived_prev[-1] < 0


# ---------------------------------------------------------------------------
# Closed-form anchors (VERDICT r3 #9): pure-python math.* evaluations of the
# papers' formulas — a route independent of BOTH the vendored goldens and the
# numpy table construction (no numpy cumprod/linspace anywhere below).
# ---------------------------------------------------------------------------

import math


def _closed_form_betas(cfg: SchedulerConfig):
    """β_t from the papers, as plain python floats.

    linear: DDPM (Ho et al. 2020) §4;  scaled_linear: LDM/SD convention
    (β in sqrt-space);  squaredcos_cap_v2: improved-DDPM (Nichol & Dhariwal
    2021) eq. 17, ᾱ(t) = cos²((t/T+s)/(1+s)·π/2), s=0.008, β capped at .999."""
    T = cfg.num_train_timesteps
    if cfg.beta_schedule == "linear":
        step = (cfg.beta_end - cfg.beta_start) / (T - 1)
        return [cfg.beta_start + t * step for t in range(T)]
    if cfg.beta_schedule == "scaled_linear":
        s0, s1 = math.sqrt(cfg.beta_start), math.sqrt(cfg.beta_end)
        step = (s1 - s0) / (T - 1)
        return [(s0 + t * step) ** 2 for t in range(T)]
    alpha_bar = lambda u: math.cos((u + 0.008) / 1.008 * math.pi / 2) ** 2
    return [
        min(1.0 - alpha_bar((t + 1) / T) / alpha_bar(t / T), 0.999)
        for t in range(T)
    ]


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_alpha_cumprod_closed_form_anchors(name):
    """ᾱ at t ∈ {0, 1, T-1} from the closed-form β formulas:
    ᾱ_0 = 1-β_0, ᾱ_1 = (1-β_0)(1-β_1), and ᾱ_{T-1} via the log-domain
    product Σ log1p(-β_t) (numerically independent of cumprod)."""
    cfg = _config(name)
    if cfg.rescale_betas_zero_snr:
        pytest.skip("zero-SNR rescale anchored separately below")
    betas = _closed_form_betas(cfg)
    T = cfg.num_train_timesteps
    expected = {
        0: 1.0 - betas[0],
        1: (1.0 - betas[0]) * (1.0 - betas[1]),
        T - 1: math.exp(math.fsum(math.log1p(-b) for b in betas)),
    }
    table = np.asarray(make_schedule(cfg).alphas_cumprod, np.float64)
    for t, want in expected.items():
        np.testing.assert_allclose(
            table[t], want, rtol=2e-6, atol=1e-12,  # f32 table vs f64 anchor
            err_msg=f"{name}: alphas_cumprod[{t}]",
        )


def test_zero_snr_rescale_closed_form_anchors():
    """Lin et al. 2023 ("Common Diffusion Noise Schedules ... Flawed"):
    after the rescale, terminal SNR is EXACTLY zero (ᾱ_{T-1} = 0) and the
    first step is unchanged (ᾱ_0 keeps its value: the affine map in
    sqrt-space fixes s_0 and sends s_{T-1} → 0)."""
    for name in CONFIG_NAMES:
        cfg = _config(name)
        if not cfg.rescale_betas_zero_snr:
            continue
        betas = _closed_form_betas(cfg)
        table = np.asarray(make_schedule(cfg).alphas_cumprod, np.float64)
        assert table[-1] == 0.0, f"{name}: terminal SNR not exactly zero"
        np.testing.assert_allclose(
            table[0], 1.0 - betas[0], rtol=2e-6,
            err_msg=f"{name}: rescale must fix alphas_cumprod[0]",
        )
        break
    else:
        pytest.skip("no shipped config enables rescale_betas_zero_snr")
