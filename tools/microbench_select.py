"""Microbenchmark the candidate-selection stages of detection.postprocess
(ops/nms.py select_top_candidate_pairs) at headline shapes — profile_infer
shows selection+decode is ~19% of detect() at batch 16, so this decomposes
it: stage-1 class-max reduce, stage-1 anchor top-k, stage-2 pair top-k,
the full two-stage selection, flat top-k for comparison, and the deferred
decode gathers.

    python tools/microbench_select.py [--batch 16] [--anchors 49104] [--classes 80]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def _time(fn, args, n=30, windows=3):
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])
    dep = (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(args[-1].dtype)
    out = fn(*args[:-1], args[-1] + dep)
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).reshape(-1)[0])
    _ = float(jnp.asarray(leaf).reshape(-1)[1])
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            leaf = jax.tree_util.tree_leaves(o)[0]
            dep = (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(
                args[-1].dtype)
            o = fn(*args[:-1], args[-1] + dep)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(jnp.asarray(leaf).reshape(-1)[1])
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    return best * 1e3


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--anchors", type=int, default=49104)
    p.add_argument("--classes", type=int, default=80)
    p.add_argument("--top-k", type=int, default=1000)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    b, a, c, k = args.batch, args.anchors, args.classes, args.top_k
    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    scores = jnp.asarray(rng.normal(-4, 2, (b, a, c)), dt)
    offsets = jnp.asarray(rng.normal(0, 0.1, (b, a, 4)), dt)

    @jax.jit
    def stage1_max(scores):
        return jnp.max(scores, axis=-1)  # (B, A)

    @jax.jit
    def stage1_full(scores):
        m = jnp.max(scores, axis=-1)
        return jax.lax.top_k(m, k)  # values used as dep chain

    @jax.jit
    def two_stage(scores):
        m = jnp.max(scores, axis=-1)
        _, anchor_sel = jax.lax.top_k(m, k)
        sel = jnp.take_along_axis(scores, anchor_sel[..., None], axis=1)
        top_scores, top_idx = jax.lax.top_k(sel.reshape(b, -1), k)
        anchor_idx = jnp.take_along_axis(anchor_sel, top_idx // c, axis=1)
        return top_scores, anchor_idx, top_idx % c

    @jax.jit
    def stage2_only(sel):  # (B, k, C) pre-gathered
        return jax.lax.top_k(sel.reshape(b, -1), k)

    @jax.jit
    def flat(scores):
        return jax.lax.top_k(scores.reshape(b, -1), k)

    @jax.jit
    def select_plus_decode(scores, offsets):
        top_scores, anchor_idx, cls = two_stage(scores)
        cand = jnp.take_along_axis(offsets, anchor_idx[..., None], axis=1)
        return top_scores, cand

    sel_pre = jnp.asarray(rng.normal(-4, 2, (b, k, c)), dt)

    results = {
        "shape": f"({b},{a},{c}) k={k} {args.dtype}",
        "stage1_classmax_ms": round(_time(stage1_max, (scores,)), 3),
        "stage1_max_topk_ms": round(_time(stage1_full, (scores,)), 3),
        "stage2_pair_topk_ms": round(_time(stage2_only, (sel_pre,)), 3),
        "two_stage_total_ms": round(_time(two_stage, (scores,)), 3),
        "flat_topk_ms": round(_time(flat, (scores,)), 3),
        "select_plus_decode_ms": round(
            _time(select_plus_decode, (scores, offsets)), 3),
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
