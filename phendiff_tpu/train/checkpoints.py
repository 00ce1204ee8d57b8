"""Training-state checkpointing with rotation + "latest" resume.

Capability parity with the reference's two-tier persistence (SURVEY.md §5):

1. *Training state* — the reference uses ``accelerator.save_state`` into
   ``checkpoints/step_<n>`` with rotation to ``checkpoints_total_limit`` and
   "latest" resolution by step sort (``utils_misc.py:323-347``,
   ``utils_training.py:57-96``).  Here that is Orbax: async-capable,
   versioned step directories, atomic writes, and the full pytree
   (params/EMA/optimizer/step) restored with correct shardings.
2. *Deployable pipeline* — diffusers-layout folders handled by
   ``phendiff_tpu/pipelines/io.py``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from phendiff_tpu.train.train_loop import TrainState


class CheckpointManager:
    """Thin wrapper over ocp.CheckpointManager with the reference's layout
    semantics (step dirs, total_limit rotation, resume-from-latest)."""

    def __init__(self, directory: str, total_limit: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=total_limit,
            create=True,
            enable_async_checkpointing=False,  # deterministic tests; flip on for prod
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        payload = {"state": state}
        if extra is not None:
            payload["extra"] = extra
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                **{
                    k: ocp.args.StandardSave(v)  # type: ignore[arg-type]
                    for k, v in payload.items()
                }
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def restore(
        self, abstract_state: TrainState, step: Optional[int] = None
    ) -> TrainState:
        """Restore at ``step`` (or latest).  ``abstract_state`` supplies the
        pytree structure/shardings (pass a freshly-initialized state)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_state)
        out = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore(abstract))
        )
        return out["state"]

    def close(self):
        self._mgr.close()
