"""Generate float64 golden fixtures for scheduler numeric parity.

Produces ``tests/fixtures/scheduler_goldens.json``: for each shipped
noise-scheduler config (``configs/noise_scheduler/*.json``), float64 values
computed by an INDEPENDENT NumPy implementation of the diffusers
``DDIMScheduler`` / ``DDIMInverseScheduler`` step semantics that the
reference relies on (``/root/reference/src/utils_models.py:186-245``,
``utils_Img2Img.py:776-798``).  This file deliberately does NOT import
``phendiff_tpu`` — the goldens and the implementation under test cannot
co-evolve.

Semantics encoded (equation provenance):

* beta schedules & cumulative products — DDPM (Ho et al. 2020) linear /
  "scaled_linear" (sqrt-space linear) / squaredcos_cap_v2 (Nichol &
  Dhariwal 2021, beta capped at 0.999).
* zero-terminal-SNR rescale — Lin et al. 2023 ("Common Diffusion Noise
  Schedules and Sample Steps are Flawed") eq. shift/scale of
  sqrt(alpha_bar).
* timestep spacings "leading" / "trailing" / "linspace" with
  ``steps_offset`` — the diffusers ``set_timesteps`` conventions.
* DDIM reverse step — Song et al. 2020 eq. 12, with diffusers' derived
  previous timestep ``t_prev = t - T // num_inference_steps`` and its
  eta-variance, clip_sample and use_clipped_model_output behaviors.
* DDIM inverse (forward-ODE) step — the same update targeting
  ``t_next = t + T // num_inference_steps`` with NO clipping, and
  ``initial_alpha_cumprod`` (= 1 when set_alpha_to_one) standing in for
  alpha_bar at "t = -1".

Run:  python tools/gen_scheduler_goldens.py
"""

import glob
import json
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
OUT = os.path.join(REPO, "tests", "fixtures", "scheduler_goldens.json")


# --------------------------------------------------------------------------
# independent float64 reference implementation (diffusers semantics)
# --------------------------------------------------------------------------


def betas_f64(cfg):
    T = cfg["num_train_timesteps"]
    sched = cfg.get("beta_schedule", "linear")
    b0, b1 = cfg.get("beta_start", 1e-4), cfg.get("beta_end", 0.02)
    if sched == "linear":
        return np.linspace(b0, b1, T, dtype=np.float64)
    if sched == "scaled_linear":
        return np.linspace(b0**0.5, b1**0.5, T, dtype=np.float64) ** 2
    if sched == "squaredcos_cap_v2":
        def abar(x):
            return np.cos((x + 0.008) / 1.008 * np.pi / 2) ** 2
        i = np.arange(T, dtype=np.float64)
        return np.minimum(1.0 - abar((i + 1) / T) / abar(i / T), 0.999)
    raise ValueError(sched)


def rescale_zero_snr(betas):
    """Lin et al. 2023: make sqrt(alpha_bar[-1]) exactly 0 (on betas, as
    the diffusers flag does; returns the rescaled alphas_cumprod)."""
    abar_sqrt = np.sqrt(np.cumprod(1.0 - betas))
    a0, aT = abar_sqrt[0].copy(), abar_sqrt[-1].copy()
    abar_sqrt = (abar_sqrt - aT) * a0 / (a0 - aT)
    return abar_sqrt**2


def alphas_cumprod_f64(cfg):
    betas = betas_f64(cfg)
    ac = np.cumprod(1.0 - betas)
    if cfg.get("rescale_betas_zero_snr", False):
        ac = rescale_zero_snr(betas)
    return ac


def set_timesteps(cfg, n):
    T = cfg["num_train_timesteps"]
    spacing = cfg.get("timestep_spacing", "leading")
    if spacing == "linspace":
        ts = np.linspace(0, T - 1, n).round()[::-1].astype(np.int64)
    elif spacing == "leading":
        ts = (np.arange(0, n) * (T // n)).round()[::-1].astype(np.int64)
        ts = ts + cfg.get("steps_offset", 0)
    elif spacing == "trailing":
        ts = np.round(np.arange(T, 0, -T / n)).astype(np.int64) - 1
    else:
        raise ValueError(spacing)
    return ts


def alpha_at(ac, t, final_alpha):
    return float(ac[t]) if t >= 0 else float(final_alpha)


def pred_x0_eps(cfg, a_t, model_output, sample):
    pt = cfg.get("prediction_type", "epsilon")
    sa, s1ma = np.sqrt(a_t), np.sqrt(1.0 - a_t)
    if pt == "epsilon":
        return (sample - s1ma * model_output) / sa, model_output
    if pt == "sample":
        return model_output, (sample - sa * model_output) / s1ma
    if pt == "v_prediction":
        return (sa * sample - s1ma * model_output,
                sa * model_output + s1ma * sample)
    raise ValueError(pt)


def ddim_step_f64(cfg, ac, model_output, t, n, sample, eta=0.0, noise=None,
                  use_clipped_model_output=False):
    """diffusers DDIMScheduler.step: t_prev derived as t - T//n."""
    T = cfg["num_train_timesteps"]
    t_prev = t - T // n
    final_alpha = 1.0 if cfg.get("set_alpha_to_one", True) else float(ac[0])
    a_t = alpha_at(ac, t, final_alpha)
    a_prev = alpha_at(ac, t_prev, final_alpha)

    x0, eps = pred_x0_eps(cfg, a_t, model_output, sample)
    if cfg.get("clip_sample", False):
        rng = cfg.get("clip_sample_range", 1.0)
        x0 = np.clip(x0, -rng, rng)
    if use_clipped_model_output:
        eps = (sample - np.sqrt(a_t) * x0) / np.sqrt(1.0 - a_t)

    variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
    std = eta * np.sqrt(variance)
    prev = (np.sqrt(a_prev) * x0
            + np.sqrt(1.0 - a_prev - std**2) * eps)
    if eta > 0:
        prev = prev + std * noise
    return prev, t_prev


def ddim_inverse_step_f64(cfg, ac, model_output, t, n, sample):
    """diffusers DDIMInverseScheduler.step: forward-ODE update toward
    t_next = t + T//n; alpha at t<0 is initial_alpha_cumprod; no clipping."""
    T = cfg["num_train_timesteps"]
    t_next = min(t + T // n, T - 1)
    initial_alpha = 1.0 if cfg.get("set_alpha_to_one", True) else float(ac[0])
    a_t = alpha_at(ac, t, initial_alpha)
    a_next = float(ac[t_next])
    x0, eps = pred_x0_eps(cfg, a_t, model_output, sample)
    nxt = np.sqrt(a_next) * x0 + np.sqrt(1.0 - a_next) * eps
    return nxt, t_next


# --------------------------------------------------------------------------
# fixture generation
# --------------------------------------------------------------------------


def main():
    rng = np.random.default_rng(12345)
    sample = rng.standard_normal(24)          # flat [24] stands in for pixels
    model_output = rng.standard_normal(24) * 0.7
    noise = rng.standard_normal(24)

    goldens = {
        "_provenance": __doc__.strip().splitlines()[0],
        "inputs": {
            "sample": sample.tolist(),
            "model_output": model_output.tolist(),
            "noise": noise.tolist(),
        },
        "configs": {},
    }

    for path in sorted(glob.glob(os.path.join(REPO, "configs/noise_scheduler/*.json"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            cfg = json.load(f)
        T = cfg["num_train_timesteps"]
        ac = alphas_cumprod_f64(cfg)
        final_alpha = 1.0 if cfg.get("set_alpha_to_one", True) else float(ac[0])

        entry = {
            "config": cfg,
            "alphas_cumprod_probe": {
                str(t): float(ac[t])
                for t in [0, 1, T // 2, T - 2, T - 1]
            },
            "final_alpha_cumprod": final_alpha,
            "timesteps": {},
            "steps": [],
            "inverse_steps": [],
        }

        for n in (50, 10, 37):
            ts = set_timesteps(cfg, n)
            entry["timesteps"][str(n)] = ts.tolist()

        # step goldens along the real n=50 schedule: first, middle, last t.
        # With rescale_betas_zero_snr, alpha_bar[T-1] == 0 exactly; epsilon
        # prediction then divides by sqrt(alpha)=0 at the terminal timestep
        # (x0 undefined — the reference stack hits the same singularity, which
        # is why zero-SNR schedules pair with v_prediction).  Probe the next
        # timestep down instead of vendoring infs.
        n = 50
        ts = set_timesteps(cfg, n)
        probe_ts = [int(ts[0]), int(ts[len(ts) // 2]), int(ts[-1])]
        if cfg.get("prediction_type", "epsilon") == "epsilon":
            probe_ts = [int(ts[1]) if 0 <= t < T and ac[t] == 0.0 else t
                        for t in probe_ts]
        for t in probe_ts:
            for eta, clipped in ((0.0, False), (0.0, True), (0.5, False)):
                prev, t_prev = ddim_step_f64(
                    cfg, ac, model_output, t, n, sample, eta=eta,
                    noise=noise, use_clipped_model_output=clipped,
                )
                entry["steps"].append({
                    "t": t, "t_prev": int(t_prev), "n": n, "eta": eta,
                    "use_clipped_model_output": clipped,
                    "prev_sample": prev.tolist(),
                })
        # inverse-step goldens: t = -1 handled as the clean-image start
        for t in [-1, int(ts[-1]), int(ts[len(ts) // 2])]:
            nxt, t_next = ddim_inverse_step_f64(cfg, ac, model_output, t, n, sample)
            entry["inverse_steps"].append({
                "t": t, "t_next": int(t_next), "n": n,
                "next_sample": nxt.tolist(),
            })

        goldens["configs"][name] = entry

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(goldens, f, indent=1)
    print(f"wrote {OUT} ({os.path.getsize(OUT)} bytes, "
          f"{len(goldens['configs'])} configs)")


if __name__ == "__main__":
    main()
