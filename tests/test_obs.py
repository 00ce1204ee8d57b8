"""Observability tests: trackers, image helpers, profiling timer, logger."""

import json
import os
import time

import numpy as np
import pytest

from phendiff_tpu.obs import (
    JSONLTracker,
    NullTracker,
    StepTimer,
    image_grid,
    latents_to_grayscale,
    make_tracker,
    setup_logger,
    side_by_side,
    to_pil,
)


def test_jsonl_tracker_logs_and_persists_run_id(tmp_path):
    t1 = JSONLTracker(str(tmp_path))
    t1.log({"loss": 1.5, "lr": 1e-4}, step=1)
    t1.log({"loss": np.float32(0.5)}, step=2)
    t1.finish()
    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 2
    # run id persists for resume (reference run_id.txt semantics)
    t2 = JSONLTracker(str(tmp_path))
    assert t2.run_id == t1.run_id


def test_jsonl_tracker_alert_cooldown(tmp_path):
    t = JSONLTracker(str(tmp_path))
    t.alert("NaN", "first")
    t.alert("NaN", "suppressed")
    t.alert("other", "different title ok")
    content = open(tmp_path / "alerts.log").read()
    assert content.count("[NaN]") == 1
    assert "[other]" in content


def test_jsonl_tracker_images(tmp_path):
    t = JSONLTracker(str(tmp_path))
    imgs = np.random.default_rng(0).random((3, 8, 8, 3)).astype(np.float32)
    t.log_images("samples/classA", imgs, step=7)
    out = list((tmp_path / "images").rglob("*.png"))
    assert len(out) == 3


def test_make_tracker_fallbacks(tmp_path):
    assert isinstance(make_tracker("none", str(tmp_path)), NullTracker)
    # wandb not installed → silently falls back to JSONL
    t = make_tracker("wandb", str(tmp_path))
    assert isinstance(t, JSONLTracker)


def test_to_pil_modes():
    x = np.linspace(-1, 1, 2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    for mode in ("clip", "minmax", "channel_minmax"):
        pils = to_pil(x, mode)
        assert len(pils) == 2 and pils[0].size == (4, 4)
    with pytest.raises(ValueError):
        to_pil(x, "bogus")


def test_image_grid_and_pairs():
    x = np.zeros((5, 8, 8, 3), dtype=np.float32)
    grid = image_grid(x)
    assert grid.size == (8 * 3, 8 * 2)  # ceil(sqrt(5))=3 cols, 2 rows
    pairs = side_by_side(x[:2], x[:2])
    assert pairs.size == (16, 16)


def test_latents_to_grayscale():
    z = np.random.default_rng(1).standard_normal((2, 4, 4, 8)).astype(np.float32)
    g = latents_to_grayscale(z)
    assert g.shape == (2, 4, 4, 1)
    assert g.min() >= 0.0 and g.max() <= 1.0


def test_step_timer():
    t = StepTimer()
    assert t.stats() == {}
    t.tick()
    time.sleep(0.01)
    t.tick()
    s = t.stats(batch_size=4)
    assert s["perf/steps_per_sec"] > 0
    assert s["perf/samples_per_sec"] == pytest.approx(
        4 * s["perf/steps_per_sec"]
    )


def test_setup_logger():
    log = setup_logger("phendiff-test")
    log.info("hello")  # no exception; handler attached once
    log2 = setup_logger("phendiff-test")
    assert len(log2.handlers) == 1


def test_wandb_tracker_through_stub(tmp_path, monkeypatch):
    """Exercise the WandbTracker adapter without the dependency (VERDICT r2
    missing #5): a stub wandb module records init/log/Image/alert/finish
    calls with the reference's call surface (train.py:100-142)."""
    import sys
    import types

    import numpy as np

    calls = []

    class FakeRun:
        id = "stub-run-id"

        def log(self, metrics, step=None):
            calls.append(("log", dict(metrics), step))

        def finish(self):
            calls.append(("finish",))

    fake = types.ModuleType("wandb")
    fake._inits = []

    def init(**kw):
        fake._inits.append(kw)
        return FakeRun()

    fake.init = init
    fake.Image = lambda arr: ("image", np.asarray(arr).shape)
    fake.alert = lambda **kw: calls.append(("alert", kw))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from phendiff_tpu.obs.trackers import WandbTracker, make_tracker

    tr = make_tracker("wandb", str(tmp_path), config={"lr": 1e-4})
    assert isinstance(tr, WandbTracker)
    assert tr.run_id == "stub-run-id"
    assert fake._inits[0]["project"] == "phendiff-tpu"
    assert fake._inits[0]["resume"] is None

    tr.log({"loss": 0.5}, step=3)
    tr.log_images("samples/DMSO", np.zeros((2, 8, 8, 3)), step=3)
    tr.alert("NaN", "non-finite loss")
    tr.finish()
    kinds = [c[0] for c in calls]
    assert kinds == ["log", "log", "alert", "finish"]
    assert calls[0] == ("log", {"loss": 0.5}, 3)
    imgs = calls[1][1]["samples/DMSO"]
    assert len(imgs) == 2 and imgs[0] == ("image", (8, 8, 3))
    assert calls[2][1]["title"] == "NaN"

    # resume-by-run-id → wandb resume="must" (reference run_id.txt path)
    WandbTracker("p", str(tmp_path), {}, run_id="abc")
    assert fake._inits[-1]["id"] == "abc"
    assert fake._inits[-1]["resume"] == "must"
