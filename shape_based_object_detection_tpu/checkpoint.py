"""Checkpoint / resume (component C18, SURVEY.md §5) via orbax.

The reference torch.save's {epoch, model, optimizer} dicts; here the full
TrainState (params, opt state, step, RNG) is saved asynchronously and
multi-host-safely with orbax's CheckpointManager, with retention and
restore-latest for crash recovery (SURVEY.md §5 failure handling: restart
from latest checkpoint).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

from shape_based_object_detection_tpu.train import TrainState


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=keep, enable_async_checkpointing=async_save
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, state: TrainState, step: Optional[int] = None) -> None:
        if step is None:
            step = int(jax.device_get(state.step))
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        """Restore the newest checkpoint into the template's structure, or
        None if the directory is empty (fresh start)."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
