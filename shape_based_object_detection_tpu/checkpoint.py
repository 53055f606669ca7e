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

    def all_steps(self) -> list:
        """Retained checkpoint steps, ascending (oldest → newest)."""
        return sorted(int(s) for s in self._mgr.all_steps())

    def restore_latest(self, template: TrainState) -> Optional[TrainState]:
        """Restore the newest checkpoint into the template's structure, or
        None if the directory is empty (fresh start).

        The EMA subtree is structure-matched automatically: a template whose
        ``ema_params`` presence disagrees with the saved checkpoint (trained
        with vs. without ``ema_decay``) is retried with the other shape, so
        callers need not know how the checkpoint was trained. Check
        ``restored.ema_params is None`` afterwards to learn what it held."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self.restore_step(step, template)

    def restore_step(self, step: int, template: TrainState) -> TrainState:
        """Restore a specific retained step (see ``all_steps``), with the
        same automatic EMA-subtree structure matching as ``restore_latest``
        (used by tools/average_checkpoints.py to walk the retention
        window)."""
        try:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except Exception as first_err:
            # orbax StandardRestore raises on tree-structure mismatch before
            # any values are read; toggle the EMA subtree and retry once.
            # (template.params is used only as an abstract structure here,
            # so no copy is needed)
            alt = template.replace(
                ema_params=(None if template.ema_params is not None
                            else template.params))
            try:
                return self._mgr.restore(
                    step, args=ocp.args.StandardRestore(alt)
                )
            except Exception:
                # Both templates failed: this is NOT an EMA-structure
                # mismatch (corrupt/partial checkpoint, IO error, ...) —
                # surface the ORIGINAL failure, not the retry's misleading
                # tree-structure complaint.
                raise first_err

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


class BestCheckpointKeeper:
    """Keeps the single best checkpoint by a monotonic metric (val mAP)
    (component C18 "best-mAP tracking"). Separate from the rolling retention
    manager so crash-recovery restores the LATEST state while serving/eval
    can always reach the BEST one.

    The best metric value persists in ``best.json`` next to the checkpoint,
    so tracking survives restarts.
    """

    def __init__(self, directory: str):
        import json

        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._meta_path = os.path.join(self.directory, "best.json")
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1, enable_async_checkpointing=False),
        )
        if os.path.exists(self._meta_path):
            with open(self._meta_path) as f:
                meta = json.load(f)
            self.best_value = float(meta["value"])
            self.best_step = int(meta["step"])
        else:
            self.best_value = float("-inf")
            self.best_step = -1

    def maybe_save(self, state: TrainState, step: int, value: float) -> bool:
        """Saves iff ``value`` beats the best so far; returns whether saved."""
        import json
        import math

        # a NaN metric must never become best_value: NaN fails every
        # comparison, so it would both save here AND let any later value
        # (however bad) overwrite the true best
        if not math.isfinite(value) or value <= self.best_value:
            return False
        self.best_value = float(value)
        self.best_step = int(step)
        # metadata first, atomically (tmp + rename). If the process dies
        # between the two writes, best.json is merely AHEAD of the stored
        # weights (updates are missed until a value beats it). The reverse
        # order is worse: a stale best.json lets a later WORSE value evict
        # the true best checkpoint (max_to_keep=1) permanently.
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"step": self.best_step, "value": self.best_value}, f)
        os.replace(tmp, self._meta_path)
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=True)
        self._mgr.wait_until_finished()
        return True

    def restore_best(self, template: TrainState) -> Optional[TrainState]:
        step = self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def close(self) -> None:
        self._mgr.close()
