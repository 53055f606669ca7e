"""Inference-side time breakdown + MFU for the headline serving config
(RetinaNet R50-FPN 512px detect(), bf16) — the counterpart of
tools/profile_train.py, answering "where does detect() time go and how far
from the chip's roofline is it".

Stages, each its own jitted program timed with the dependent-chain
methodology (bench.py): forward only (normalize + backbone/FPN/heads),
forward + candidate selection + deferred decode (everything but NMS), and
the full detect() (adds class-aware NMS). Differences bound each stage.
MFU comes from XLA's cost analysis of the compiled full-detect executable
against the v5e bf16 peak.

    python tools/profile_infer.py [--model retinanet_r50_fpn] [--batch 16]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

V5E_BF16_PEAK_FLOPS = 1.97e14


def _time_fn(fn, args, n=20, windows=3):
    """Dependent-chain timing (see bench.py): iteration i+1 consumes a
    scalar of iteration i, the clock stops on a scalar readback, and the
    bare readback RTT is subtracted."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(first).reshape(-1)[0])
    # warm the dependent-add executable and the RTT probe's (1,) gather
    dep = (jnp.asarray(first).reshape(-1)[0] * 0).astype(args[-1].dtype)
    out = fn(*args[:-1], args[-1] + dep)
    leaf0 = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf0).reshape(-1)[0])
    _ = float(jnp.asarray(leaf0).reshape(-1)[1])

    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            leaf = jax.tree_util.tree_leaves(o)[0]
            dep = (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(args[-1].dtype)
            o = fn(*args[:-1], args[-1] + dep)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(jnp.asarray(leaf).reshape(-1)[1])
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="retinanet_r50_fpn")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.detection import make_detect_fn
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.ops import boxes as box_ops
    from shape_based_object_detection_tpu.ops import nms as nms_lib
    from shape_based_object_detection_tpu.utils.image import normalize_images

    cfg = config_lib.get_config(args.model)
    model_cfg = dataclasses.replace(cfg.model, dtype=args.dtype)
    module, variables, anchors = build_model(model_cfg)
    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)

    b, s = args.batch, model_cfg.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
    det_cfg = model_cfg.detect

    @jax.jit
    def fwd_only(variables, images):
        x = normalize_images(images, cfg.data.mean, cfg.data.std)
        return module.apply(variables, x)[0]

    @jax.jit
    def fwd_select(variables, images):
        """Everything but NMS: forward + two-stage candidate selection +
        deferred decode of the K winners (mirrors detection.postprocess)."""
        x = normalize_images(images, cfg.data.mean, cfg.data.std)
        cls_logits, box_offsets = module.apply(variables, x)
        pairs = box_offsets.shape[1] * (cls_logits.shape[-1]
                                        - (0 if det_cfg.use_sigmoid else 1))
        if det_cfg.use_sigmoid:
            sel_scores, activation = cls_logits, jax.nn.sigmoid
        else:
            sel_scores = jax.nn.softmax(cls_logits, axis=-1)[..., 1:]
            activation = None
        select = jax.vmap(functools.partial(
            nms_lib.select_top_candidate_pairs,
            score_threshold=det_cfg.score_threshold,
            top_k=det_cfg.pre_nms_top_k, approx=det_cfg.approx_topk,
            activation=activation,
            two_stage=(pairs >= 2_000_000 or b >= 4)))
        anchor_idx, cand_scores, _, _ = select(sel_scores)
        cand_offsets = jnp.take_along_axis(
            box_offsets, anchor_idx[..., None], axis=1)
        decoded = box_ops.decode_boxes(cand_offsets, anchors[anchor_idx],
                                       model_cfg.anchors.variances)
        return box_ops.clip_boxes(box_ops.cxcywh_to_xyxy(decoded)), cand_scores

    results = {"model": args.model, "batch": b, "dtype": args.dtype}
    results["forward_ms"] = _time_fn(fwd_only, (variables, images)) * 1e3
    results["forward_select_ms"] = _time_fn(
        fwd_select, (variables, images)) * 1e3
    results["detect_ms"] = _time_fn(detect, (variables, images)) * 1e3
    results["images_per_sec"] = b / (results["detect_ms"] / 1e3)

    try:
        compiled = detect.lower(variables, images).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = float(cost.get("flops", 0.0))
        results["xla_flops_per_batch"] = flops
        results["mfu_pct"] = round(
            100.0 * flops / (results["detect_ms"] / 1e3)
            / V5E_BF16_PEAK_FLOPS, 1)
        results["bytes_accessed_per_batch"] = float(
            cost.get("bytes accessed", 0.0)) or None
    except Exception as e:  # cost analysis is best-effort
        results["cost_analysis_error"] = str(e)

    results["derived"] = {
        "selection_plus_decode_ms": round(
            results["forward_select_ms"] - results["forward_ms"], 2),
        "nms_ms": round(results["detect_ms"] - results["forward_select_ms"],
                        2),
    }
    for k in ("forward_ms", "forward_select_ms", "detect_ms",
              "images_per_sec"):
        results[k] = round(results[k], 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
