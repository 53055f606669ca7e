"""Checkpoint averaging ("model soup" / SWA-style) over the retention window.

Averages the float parameters of several retained checkpoints from one
training run into a NEW checkpoint directory that every serving surface
(eval_cli / detect_cli / export_model / sbd-serve --checkpoint-dir) loads
unchanged. Late-training SGD iterates orbit a flat minimum; their average
sits closer to its center than any single iterate (Izmailov et al., SWA,
UAI 2018) — a zero-training-cost accuracy lever to try next to EMA (which
is the *running* flavor of the same idea; this tool averages *saved*
checkpoints after the fact, including runs trained without --ema-decay).

    python tools/average_checkpoints.py \
        --config /ckpt/run/resolved_config.json \
        --checkpoint-dir /ckpt/run --last 3 --out /ckpt/run_avg

What is averaged: ``params`` always; ``ema_params`` when every selected
checkpoint has one (a soup of EMAs); float leaves of ``extra_vars``
(batch_stats means/vars — averaging running moments of nearby iterates is
the standard SWA practice short of a re-estimation pass). Non-float leaves
and the optimizer state are taken from the NEWEST selected checkpoint, and
``step`` keeps its value, so the output also restores cleanly as a resume
point.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def average_states(states):
    """Leaf-wise mean over TrainState pytrees (see module docstring for
    which subtrees participate). Accumulates in float32 regardless of leaf
    dtype, casts back per leaf."""
    import jax
    import jax.numpy as jnp

    newest = states[-1]
    n = float(len(states))

    def mean_leaves(*leaves):
        ref = leaves[-1]
        if not jnp.issubdtype(jnp.asarray(ref).dtype, jnp.floating):
            return ref  # counts etc. — keep the newest
        acc = sum(jnp.asarray(l, jnp.float32) for l in leaves)
        return (acc / n).astype(jnp.asarray(ref).dtype)

    avg_params = jax.tree_util.tree_map(
        mean_leaves, *[s.params for s in states])
    avg_extra = jax.tree_util.tree_map(
        mean_leaves, *[s.extra_vars for s in states])
    have_ema = [s.ema_params is not None for s in states]
    if all(have_ema):
        avg_ema = jax.tree_util.tree_map(
            mean_leaves, *[s.ema_params for s in states])
    elif any(have_ema):
        raise SystemExit(
            "selected checkpoints disagree on EMA presence (a run whose "
            "--ema-decay changed mid-training?) — pass --steps to select a "
            "consistent subset")
    else:
        avg_ema = None
    return newest.replace(params=avg_params, extra_vars=avg_extra,
                          ema_params=avg_ema)


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--config", required=True,
                   help="preset name or resolved_config.json path (the run's "
                        "dumped config — must match the checkpoints)")
    p.add_argument("--checkpoint-dir", required=True,
                   help="the training run's rolling checkpoint root")
    p.add_argument("--out", required=True,
                   help="directory for the averaged checkpoint (created; "
                        "loadable by eval_cli/detect_cli/export_model)")
    p.add_argument("--steps", default="",
                   help="comma-separated step numbers to average "
                        "(default: every retained step)")
    p.add_argument("--last", type=int, default=0,
                   help="average only the newest K retained steps")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="config overrides, as in train_cli")
    args = p.parse_args(argv)

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager
    from shape_based_object_detection_tpu.models.factory import build_model

    cfg = config_lib.resolve_config(args.config, args.set)
    mgr = CheckpointManager(args.checkpoint_dir)
    retained = mgr.all_steps()
    if not retained:
        raise SystemExit(f"no checkpoints in {args.checkpoint_dir!r}")
    if args.steps:
        try:
            steps = sorted(int(s) for s in args.steps.split(",") if s.strip())
        except ValueError:
            raise SystemExit(f"--steps must be comma-separated integers, "
                             f"got {args.steps!r}")
        missing = [s for s in steps if s not in retained]
        if missing:
            raise SystemExit(f"steps {missing} not retained; available: "
                             f"{retained}")
    else:
        steps = retained
    if args.last:
        steps = steps[-args.last:]
    if len(steps) < 2:
        raise SystemExit(f"need >=2 checkpoints to average, selected {steps} "
                         f"(retained: {retained})")

    module, variables, _ = build_model(cfg.model)
    template = train_lib.create_train_state(module, variables, cfg)
    states = [mgr.restore_step(s, template) for s in steps]
    mgr.close()
    avg = average_states(states)

    out = CheckpointManager(args.out, async_save=False)
    out.save(avg, step=steps[-1])
    out.wait()
    out.close()
    print(f"averaged {len(steps)} checkpoints {steps} -> {args.out} "
          f"(step {steps[-1]})")


if __name__ == "__main__":
    main()
