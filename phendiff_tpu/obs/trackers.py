"""Experiment tracking abstraction (wandb-compatible, offline-first).

Capability parity with the reference's observability (SURVEY.md §5): wandb
scalar logging per step, image panels, NaN alerts with cooldown, run-id
persistence for resume (``train.py:96-143``, ``utils_training.py:318-336``).

Design: a small ``Tracker`` interface with three backends —

* ``JSONLTracker`` — metrics to ``metrics.jsonl``, images to PNG files,
  alerts to ``alerts.log``; the default in this zero-egress environment and
  a stable machine-readable format for tooling;
* ``WandbTracker`` — thin adapter used when wandb is importable and
  configured (same call surface as the reference's accelerate trackers);
* ``NullTracker`` — no-op for tests.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class Tracker:
    run_id: str = ""

    def log(self, metrics: Dict[str, float], step: int) -> None:
        raise NotImplementedError

    def log_images(self, name: str, images01: np.ndarray, step: int) -> None:
        raise NotImplementedError

    def alert(self, title: str, text: str) -> None:
        raise NotImplementedError

    def finish(self) -> None:
        pass


class NullTracker(Tracker):
    def log(self, metrics, step):
        pass

    def log_images(self, name, images01, step):
        pass

    def alert(self, title, text):
        pass


class JSONLTracker(Tracker):
    """File-based tracker with the reference's alert-cooldown semantics
    (6h between identical alert titles, utils_training.py:328-336)."""

    ALERT_COOLDOWN_S = 6 * 3600

    def __init__(self, run_dir: str, run_id: Optional[str] = None):
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        # run-id persistence → resume continuity (reference run_id.txt)
        id_path = os.path.join(run_dir, "run_id.txt")
        if run_id is None and os.path.exists(id_path):
            with open(id_path) as f:
                run_id = f.read().strip()
        if not run_id:
            run_id = hex(int(time.time() * 1e6))[2:]
        with open(id_path, "w") as f:
            f.write(run_id)
        self.run_id = run_id
        self._metrics_f = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._alerts_path = os.path.join(run_dir, "alerts.log")
        self._last_alert: Dict[str, float] = {}

    def log(self, metrics, step):
        rec = {"step": int(step), "ts": time.time()}
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._metrics_f.write(json.dumps(rec) + "\n")
        self._metrics_f.flush()

    def log_images(self, name, images01, step):
        from PIL import Image

        name = name.replace(os.sep, "_")  # names like "samples/DMSO"
        out_dir = os.path.join(self.run_dir, "images", f"step_{step:08d}")
        os.makedirs(out_dir, exist_ok=True)
        arr = np.asarray(images01)
        arr = (np.clip(arr, 0, 1) * 255).astype(np.uint8)
        for i, img in enumerate(arr):
            if img.shape[-1] == 1:
                img = img[..., 0]
            Image.fromarray(img).save(
                os.path.join(out_dir, f"{name}_{i:03d}.png")
            )

    def alert(self, title, text):
        now = time.time()
        if now - self._last_alert.get(title, -1e12) < self.ALERT_COOLDOWN_S:
            return
        self._last_alert[title] = now
        with open(self._alerts_path, "a") as f:
            f.write(f"{time.ctime()} [{title}] {text}\n")

    def finish(self):
        self._metrics_f.close()


class WandbTracker(Tracker):
    def __init__(self, project: str, run_dir: str, config: dict,
                 run_id: Optional[str] = None):
        import wandb  # gated: not installed in this environment

        resume = "must" if run_id else None
        self._run = wandb.init(
            project=project, dir=run_dir, config=config, id=run_id,
            resume=resume,
        )
        self.run_id = self._run.id
        self._wandb = wandb

    def log(self, metrics, step):
        self._run.log(metrics, step=step)

    def log_images(self, name, images01, step):
        imgs = [self._wandb.Image(np.asarray(i)) for i in images01]
        self._run.log({name: imgs}, step=step)

    def alert(self, title, text):
        self._wandb.alert(
            title=title, text=text,
            wait_duration=JSONLTracker.ALERT_COOLDOWN_S,
        )

    def finish(self):
        self._run.finish()


def make_tracker(kind: str, run_dir: str, project: str = "phendiff-tpu",
                 config: Optional[dict] = None) -> Tracker:
    if kind in ("none", "no"):
        return NullTracker()
    if kind == "wandb":
        try:
            return WandbTracker(project, run_dir, config or {})
        except ImportError:
            pass  # fall through to JSONL in offline environments
    return JSONLTracker(run_dir)
