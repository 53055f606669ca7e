"""Shared CLI plumbing (single source for the checkpoint-restore block the
detect/eval/serve/export/calibrate entry points all need)."""

from __future__ import annotations


def restore_checkpoint_variables(cfg, module, variables, checkpoint_dir: str,
                                 ema: bool = False):
    """Restore the latest checkpoint in ``checkpoint_dir`` and return the
    serving ``variables`` ({params or ema_params} + extra collections).

    Fails loud (SystemExit, CLI semantics) on a missing/empty directory —
    silently serving or exporting fresh random weights on a typo'd path
    produces plausible-looking garbage — and on ``ema=True`` against a
    checkpoint trained without EMA."""
    import dataclasses

    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager

    if ema and cfg.train.ema_decay == 0:
        # restore template must carry the EMA subtree to match a checkpoint
        # trained with --ema-decay
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ema_decay=0.99))
    state = train_lib.create_train_state(module, variables, cfg)
    restored = CheckpointManager(checkpoint_dir).restore_latest(state)
    if restored is None:
        raise SystemExit(
            f"no checkpoint found in {checkpoint_dir!r} — check the path "
            "(omit --checkpoint-dir to use fresh-initialized weights "
            "deliberately)")
    if ema and restored.ema_params is None:
        raise SystemExit("--ema: checkpoint has no EMA weights (train with "
                         "--ema-decay > 0)")
    params = restored.ema_params if ema else restored.params
    return {"params": params, **restored.extra_vars}


def enable_tta_hflip(cfg):
    """Return ``cfg`` with ``model.detect.tta_hflip=True`` (the --tta-hflip
    CLI shortcut; equivalent to --set model.detect.tta_hflip=true)."""
    import dataclasses

    return dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model,
            detect=dataclasses.replace(cfg.model.detect, tta_hflip=True)))
