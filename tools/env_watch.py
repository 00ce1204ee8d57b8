"""Round-start environment watch (VERDICT r4 #8, carried from r2).

Two absolutes stay env-blocked until the image changes; this check makes
the blocker's status machine-checkable at the top of every round:

* **Scheduler / manifest goldens** — if ``diffusers`` + ``torch`` (with
  the SD-2.1 weights) ever appear, regenerate
  ``tests/goldens/scheduler_*.json`` via ``tools/gen_scheduler_goldens.py``
  and the SD-2.1 manifest via ``tools/gen_sd21_manifest.py`` from the
  real library instead of the pinned float64 re-derivations
  (risk note: docs/SCHEDULER_PARITY.md).
* **Absolute FID/ISC/KID parity** — the reference computes metrics with
  the pinned pretrained FID-InceptionV3
  (``/root/reference/src/utils_training.py:975-988``).  This image has
  no weights file and no egress, so absolute metric values here come
  from a random-init Inception (loudly tagged).  If a weights file
  appears, point ``PHENDIFF_INCEPTION_WEIGHTS`` at it
  (``phendiff_tpu/metrics/inception.py``) and capture absolute parity.

Usage: python tools/env_watch.py   (prints one JSON line)
"""

import glob
import importlib.util
import json
import os


def check() -> dict:
    weights_env = os.environ.get("PHENDIFF_INCEPTION_WEIGHTS", "")
    candidates = [] if not weights_env else [weights_env]
    for pat in (
        "/root/.cache/torch/hub/checkpoints/*inception*",
        "/root/.cache/huggingface/**/*inception*",
        "/opt/**/pt_inception*.pth",
    ):
        candidates += glob.glob(pat, recursive=True)
    return {
        "diffusers": importlib.util.find_spec("diffusers") is not None,
        "torch": importlib.util.find_spec("torch") is not None,
        "torch_fidelity": importlib.util.find_spec("torch_fidelity")
        is not None,
        "inception_weights": next(
            (c for c in candidates if os.path.isfile(c)), None),
        "actions_unblocked": [],
    }


def main() -> int:
    st = check()
    if st["diffusers"] and st["torch"]:
        st["actions_unblocked"].append(
            "regenerate scheduler goldens + SD-2.1 manifest from diffusers")
    if st["inception_weights"]:
        st["actions_unblocked"].append(
            "set PHENDIFF_INCEPTION_WEIGHTS and capture absolute FID parity")
    print(json.dumps(st))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
