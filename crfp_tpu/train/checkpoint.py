"""Step-indexed checkpointing of {params, opt_state, step} via Orbax.

Upgrades the reference's bare ``torch.save(state_dict)`` every
``save_every`` iterations (/root/reference/trainer.py:276-280) to real
resume: optimizer state and the iteration counter are restored too
(SURVEY.md §5.3-5.4 lists this as a reference gap to close).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int | None = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: Any, step: int | None = None) -> Any:
        """Restore into the structure of ``state`` (a TrainState)."""
        step = self.latest_step() if step is None else step
        if step is None:
            return state
        target = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        return state.replace(
            params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
        )

    def close(self):
        self._mgr.close()
