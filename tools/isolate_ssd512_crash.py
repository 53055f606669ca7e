"""Isolate which stage of the fused SSD-512 batch-8 detect program kills the
TPU worker ("kernel fault"; see STATUS.md). Each variant runs in its own
subprocess so a crash doesn't take the driver down.

HISTORICAL (2026-08-17): the culprit was `jax.lax.approx_max_k` in the bf16
program at exactly batch 8. Candidate selection has since moved to an exact
two-stage top_k (ops/nms.py) that never emits approx_max_k, so the crash is
unreachable and this tool's approx-related variants now all take the same
code path. Kept for provenance and as a template for future triage.

    python tools/isolate_ssd512_crash.py            # run all variants
    python tools/isolate_ssd512_crash.py --one V    # internal: one variant
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

VARIANTS = [
    "fused_default",      # the crashing config: bf16, approx topk, pallas NMS
    "nms_scan",           # swap Pallas NMS -> lax.scan backend
    "nms_matrix",         # swap -> round-based matrix backend
    "exact_topk",         # approx_max_k -> exact top_k
    "f32",                # bf16 -> float32 compute
    "forward_only",       # no postprocess at all
    "batch4",             # smaller batch, otherwise default
    "batch16",            # larger batch, otherwise default
    "barrier",            # optimization_barrier before approx_max_k
    "softmax_f32",        # softmax (and selection) computed in f32
]


def run_variant(name: str) -> None:
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.detection import make_detect_fn
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    cfg = config_lib.get_config("config3_ssd512_voc_train")
    model_cfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    batch = 8
    det = model_cfg.detect
    if name == "nms_scan":
        det = dataclasses.replace(det, nms_backend="scan")
    elif name == "nms_matrix":
        det = dataclasses.replace(det, nms_backend="matrix")
    elif name == "exact_topk":
        det = dataclasses.replace(det, approx_topk=False)
    elif name == "f32":
        model_cfg = dataclasses.replace(model_cfg, dtype="float32")
    elif name == "batch4":
        batch = 4
    elif name == "batch16":
        batch = 16
    model_cfg = dataclasses.replace(model_cfg, detect=det)

    if name in ("barrier", "softmax_f32"):
        from shape_based_object_detection_tpu.ops import nms as nms_mod

        orig = nms_mod.select_top_candidates

        def patched(boxes_xyxy, class_scores, **kw):
            if name == "softmax_f32":
                class_scores = class_scores.astype(jnp.float32)
            else:
                class_scores = jax.lax.optimization_barrier(
                    class_scores.astype(jnp.float32))
            return orig(boxes_xyxy, class_scores, **kw)

        nms_mod.select_top_candidates = patched

    module, variables, anchors = build_model(model_cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, 512, 512, 3), dtype=np.uint8))

    if name == "forward_only":
        from shape_based_object_detection_tpu.utils.image import (
            normalize_images,
        )

        @jax.jit
        def fwd(variables, images):
            x = normalize_images(images, cfg.data.mean, cfg.data.std)
            return module.apply(variables, x)

        for i in range(10):
            out = fwd(variables, images)
            jax.block_until_ready(out)
        print(json.dumps({"variant": name, "ok": True}))
        return

    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)
    out = detect(variables, images)
    _ = float(out.scores[0, 0])
    # several dependent iterations: the crash shows within a few
    for i in range(10):
        dep = (out.labels[0, 0] * 0).astype(images.dtype)
        out = detect(variables, images + dep)
        _ = float(out.scores[0, 0])
    print(json.dumps({"variant": name, "ok": True}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", default="")
    ap.add_argument("--variants", default=",".join(VARIANTS))
    args = ap.parse_args()
    if args.one:
        run_variant(args.one)
        return

    for v in args.variants.split(","):
        cmd = [sys.executable, __file__, "--one", v]
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1500)
            ok = any(l.startswith("{") for l in r.stdout.splitlines())
            err = (r.stderr.strip().splitlines()[-1]
                   if (not ok and r.stderr) else "")
            print(json.dumps({"variant": v, "ok": ok, "rc": r.returncode,
                              "err": err[:160]}), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({"variant": v, "ok": False, "err": "timeout"}),
                  flush=True)
            ok = False
        if not ok:
            time.sleep(150)  # let a crashed worker restart before the next


if __name__ == "__main__":
    main()
