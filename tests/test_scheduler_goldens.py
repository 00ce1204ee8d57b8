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
