"""Backward-pass + optimizer decomposition for the headline training config
(VERDICT r3 item 4: backward+update is 33.5 ms — 52% of the train step —
and was the only unexamined stage).

The train profile (tools/profile_train.py) bounds backward+update as one
lump (full_step − forward_loss − augment). This tool splits that lump two
ways, all with the dependent-chain methodology (bench.py):

1. **Backward by layer group** (incremental-grad trick): time
   ``value_and_grad`` w.r.t. a *subset* of params with the rest
   ``stop_gradient``-ed. XLA dead-code-eliminates every backward op whose
   result is unused, so grads w.r.t. the heads alone time a backward that
   stops at the heads; heads+FPN adds the FPN chain; all params is the full
   backward. Differences = per-group backward cost (heads / FPN /
   backbone), with the forward (timed separately) subtracted.
2. **Optimizer/EMA split**: the full grad+update program minus the
   grad-only program isolates clip+SGD(+wd)+apply(+EMA); a standalone
   jitted update(grads) cross-checks it.

Levers measurable in-process:
  --momentum-dtype bfloat16   optax.sgd accumulator_dtype (halves the
                              momentum read+write HBM traffic)
  --ema                       include the EMA pass (capstone configuration)
  --remat                     jax.checkpoint around the forward

XLA-flag levers are environment-level: launch this tool (or bench_train.py)
with ``XLA_FLAGS=...`` variants — flags are read once at backend init.

    python tools/profile_backward.py [--batch 16] [--momentum-dtype bfloat16]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def _time_fn(fn, args, n=20, windows=3):
    """Dependent-chain timing: each iter consumes a scalar of the last.
    The last positional arg must be an array the scalar can be folded into.
    """
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(first).reshape(-1)[0])

    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            leaf = jax.tree_util.tree_leaves(o)[0]
            dep = (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(
                args[-1].dtype if hasattr(args[-1], "dtype") else jnp.float32)
            o = fn(*args[:-1], args[-1] + dep)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--model", default="retinanet_r50_fpn")
    p.add_argument("--momentum-dtype", default="",
                   help="optax.sgd accumulator_dtype override "
                        "(e.g. bfloat16) — the optimizer-HBM lever")
    p.add_argument("--ema", action="store_true",
                   help="include the EMA update (decay 0.999) in the "
                        "full-step/update programs")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model smoke mode (CPU CI)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.models.factory import build_model

    if args.tiny:
        model_cfg = config_lib.tiny_test_model("retinanet")
    else:
        model_cfg = dataclasses.replace(
            config_lib.get_config(args.model).model, dtype="bfloat16")
    if args.remat:
        # Mirror train_cli/bench_train: --remat measures the shipped
        # segment-wise ModelConfig.remat path, not the legacy whole-forward
        # jax.checkpoint (which barely lowers peak memory).
        model_cfg = dataclasses.replace(model_cfg, remat=True)
    train_cfg = config_lib.get_config("config3_ssd512_voc_train").train
    train_cfg = dataclasses.replace(
        train_cfg,
        ema_decay=0.999 if args.ema else 0.0,
        remat=args.remat,
        momentum_dtype=args.momentum_dtype)
    cfg = dataclasses.replace(
        config_lib.get_config("config2_retinanet_r50_infer"),
        model=model_cfg, train=train_cfg)

    module, variables, anchors = build_model(model_cfg)
    loss_fn = train_lib.make_loss_fn(module, anchors, cfg)

    # TrainConfig.momentum_dtype is a real config lever now (set above), so
    # the production optimizer chain IS the measured one.
    tx = train_lib.make_optimizer(train_cfg)

    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    opt_state = tx.init(params)
    ema = (jax.tree_util.tree_map(jnp.copy, params) if args.ema else None)

    b, s, g = args.batch, model_cfg.image_size, 32
    rng = np.random.default_rng(0)
    # pre-augmented float images: this profile isolates fwd/bwd/update
    # (augment has its own published number — BASELINE.md)
    images = jnp.asarray(
        rng.standard_normal((b, s, s, 3)).astype(np.float32))
    if model_cfg.dtype == "bfloat16":
        images = images.astype(jnp.bfloat16)
    boxes = jnp.asarray(
        np.tile(np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32),
                (b, g, 1)).reshape(b, g, 4))
    labels = jnp.ones((b, g), jnp.int32)
    valid = jnp.asarray(np.tile([True] + [False] * (g - 1), (b, 1)))

    groups = sorted(params.keys())

    @jax.jit
    def fwd_loss(params, images_):
        return loss_fn(params, extra, images_, boxes, labels, valid)[0]

    def make_partial_grad(active_keys):
        """value_and_grad w.r.t. only `active_keys` top-level param groups;
        the rest are closed over via stop_gradient — XLA DCEs their backward
        chain, so the timing covers backward up to (and including) the
        active groups only."""
        act = tuple(active_keys)

        @jax.jit
        def run(params, images_):
            frozen = {k: jax.lax.stop_gradient(v)
                      for k, v in params.items() if k not in act}

            def f(p_sub):
                merged = {**frozen, **p_sub}
                return loss_fn(merged, extra, images_, boxes, labels,
                               valid)[0]

            loss, grads = jax.value_and_grad(f)(
                {k: params[k] for k in act})
            return loss, grads

        return run

    @jax.jit
    def grad_and_update(params, opt_state, ema_in, images_):
        loss2, grads = jax.value_and_grad(
            lambda p: loss_fn(p, extra, images_, boxes, labels, valid)[0]
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if ema_in is not None:
            d = 0.999
            new_ema = jax.tree_util.tree_map(
                lambda e, q: d * e + (1.0 - d) * q, ema_in, new_params)
        else:
            new_ema = None
        return loss2, new_params, new_opt, new_ema

    @jax.jit
    def update_only(grads, params, opt_state, ema_in, dep):
        grads = jax.tree_util.tree_map(lambda x: x + dep.astype(x.dtype),
                                       grads)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        if ema_in is not None:
            d = 0.999
            new_ema = jax.tree_util.tree_map(
                lambda e, q: d * e + (1.0 - d) * q, ema_in, new_params)
        else:
            new_ema = None
        return new_params, new_opt, new_ema

    results = {"model": args.model if not args.tiny else "tiny",
               "batch": b, "groups": groups,
               "momentum_dtype": args.momentum_dtype or "float32",
               "ema": args.ema, "remat": args.remat}

    t_fwd = _time_fn(fwd_loss, (params, images))
    results["forward_loss_ms"] = round(t_fwd * 1e3, 2)

    # incremental backward: heads first (shallowest), then + fpn, then all.
    # group names differ per family; order groups by typical depth when the
    # canonical names exist, else lexicographic.
    order = [k for k in ("cls_head", "box_head", "heads", "fpn",
                         "backbone") if k in groups]
    order += [k for k in groups if k not in order]
    cumulative, t_prev, incr = [], t_fwd, {}
    for k in order:
        cumulative.append(k)
        t = _time_fn(make_partial_grad(cumulative), (params, images))
        incr[k] = round((t - t_prev) * 1e3, 2)
        t_prev = t
    t_grad_all = t_prev
    results["backward_incremental_ms"] = incr
    results["backward_total_ms"] = round((t_grad_all - t_fwd) * 1e3, 2)
    results["grad_all_ms"] = round(t_grad_all * 1e3, 2)

    t_full = _time_fn(grad_and_update, (params, opt_state, ema, images))
    results["grad_update_ms"] = round(t_full * 1e3, 2)
    results["optimizer_ms"] = round((t_full - t_grad_all) * 1e3, 2)

    # standalone update cross-check (grads = params-shaped ones)
    grads0 = jax.tree_util.tree_map(jnp.ones_like, params)
    dep0 = jnp.zeros((), jnp.float32)
    t_upd = _time_fn(lambda g_, p_, o_, e_, d_: update_only(g_, p_, o_, e_, d_),
                     (grads0, params, opt_state, ema, dep0))
    results["update_only_ms"] = round(t_upd * 1e3, 2)
    results["images_per_sec_fwd_bwd_update"] = round(b / t_full, 1)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
