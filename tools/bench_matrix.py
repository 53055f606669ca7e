"""Measured throughput matrix across all four model configs.

Runs end-to-end detect() (normalize -> forward -> decode -> NMS -> top-k)
for every (model, batch) cell on the real chip and prints a JSON line per
cell plus a markdown table at the end. Methodology identical to bench.py:
dependent-iteration chains + scalar-readback sync, best-of-W windows.

Usage: python tools/bench_matrix.py [--models ssd300,ssd512,...] [--batches 1,8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

MODELS = {
    "ssd300": "config1_ssd300_infer",
    "ssd512": "config3_ssd512_voc_train",
    "retinanet_r50_fpn": "config2_retinanet_r50_infer",
    "retinanet_r101_fpn": "config4_retinanet_r101_coco_train",
}


def bench_one(model_key: str, batch: int, iters: int, windows: int,
              quantize: str = "", tta: bool = False,
              tta_scales: str = "") -> dict:
    """``quantize``: "" (bf16) | "weights" (int8 weight-only) | "full"
    (int8 weights + dynamic-int8 activations on the MXU) | "full-static"
    (calibrated static activation scales — calibrated in-process on the
    bench inputs; measures the PTQ latency tier). ``tta_scales`` (e.g.
    "512,640") measures the batched multi-scale TTA path
    (MultiScaleBatchDetector) — composes with ``quantize``: the
    throughput-champion static-int8 tier under the accuracy-champion
    multi-scale TTA."""
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model

    cfg = config_lib.get_config(MODELS[model_key])
    model_cfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    if tta:
        model_cfg = dataclasses.replace(
            model_cfg,
            detect=dataclasses.replace(model_cfg.detect, tta_hflip=True))
    module, variables, anchors = build_model(model_cfg)
    from shape_based_object_detection_tpu.quantize import (
        calibrate_activation_scales, make_serving_detect,
    )

    size = model_cfg.image_size
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)

    quantize_label = quantize
    act_scales = None
    if quantize == "full-static":
        act_scales = calibrate_activation_scales(
            module, variables, [images_np], cfg.data)
        quantize = "full"
    if tta_scales:
        from shape_based_object_detection_tpu.detection import (
            MultiScaleBatchDetector,
        )

        detect = MultiScaleBatchDetector(
            model_cfg, variables, [int(s) for s in tta_scales.split(",")],
            cfg.data, quantize=quantize, activation_scales=act_scales)
        variables = detect.serving_variables
    else:
        detect, variables = make_serving_detect(
            module, anchors, model_cfg, cfg.data, variables, quantize,
            activation_scales=act_scales)

    images = jnp.asarray(images_np)

    out = detect(variables, images)  # compile + warmup
    _ = float(out.scores[0, 0])
    dep = (out.labels[0, 0] * 0).astype(images.dtype)
    out = detect(variables, images + dep)  # compile the dep-add program
    _ = float(out.scores[0, 0])
    # warm the RTT probe's (0,1) gather too: it is a different cached
    # executable from the (0,0) slice, and cold-compiling it inside the
    # timed rtt measurement would inflate the subtracted RTT (bench.py has
    # the same guard)
    _ = float(out.scores[0, 1])

    best_dt = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters):
            dep = (out.labels[0, 0] * 0).astype(images.dtype)
            out = detect(variables, images + dep)
        _ = float(out.scores[0, 0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(out.scores[0, 1])  # pure host<->device RTT
        rtt = time.perf_counter() - r0
        best_dt = min(best_dt, (t1 - t0 - rtt) / iters)
    return {
        "model": model_key, "image_size": size, "batch": batch,
        "quantized": quantize_label, "tta_hflip": tta,
        "tta_scales": tta_scales,
        "ms_per_batch": round(best_dt * 1e3, 3),
        "images_per_sec_per_chip": round(batch / best_dt, 1),
    }


def _run_cell_subprocess(model: str, batch: int, iters: int,
                         windows: int, quantize: str = "",
                         tta: bool = False, tta_scales: str = "") -> dict:
    """One cell per child process: a TPU-worker crash (observed with the
    SSD-512 fused program) kills the client for the whole process, so cells
    must not share one. The worker itself restarts in ~2 min; retry once."""
    import subprocess

    cmd = [sys.executable, __file__, "--one", f"{model}:{batch}",
           "--iters", str(iters), "--windows", str(windows)]
    if quantize:
        cmd.extend(["--quantize", quantize])
    if tta:
        cmd.append("--tta")
    if tta_scales:
        cmd.extend(["--tta-scales", tta_scales])
    for attempt in range(2):
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=1200)
        except subprocess.TimeoutExpired:
            print(f"# {model} b={batch} attempt {attempt}: timed out (hung "
                  "tunnel?)", file=sys.stderr, flush=True)
            time.sleep(150)
            continue
        for line in r.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        print(f"# {model} b={batch} attempt {attempt}: rc={r.returncode} "
              f"{r.stderr.strip().splitlines()[-1] if r.stderr else ''}",
              file=sys.stderr, flush=True)
        time.sleep(150)  # give a crashed TPU worker time to restart
    return {"model": model, "batch": batch, "error": "failed twice"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--quantize", nargs="?", const="weights", default="",
                    choices=["weights", "full", "full-static"],
                    help="bench the int8 detect path: 'weights' (weight-only"
                         ", the default when the flag is bare), 'full' "
                         "(+dynamic-int8 activations on the MXU), or "
                         "'full-static' (calibrated static scales)")
    ap.add_argument("--tta", action="store_true",
                    help="bench with hflip test-time augmentation "
                         "(model.detect.tta_hflip=true; ~2x forward work)")
    ap.add_argument("--tta-scales", default="",
                    help="bench the batched multi-scale TTA path (e.g. "
                         "512,640); composes with --quantize (one quantized "
                         "tree serves every scale) and --tta")
    ap.add_argument("--one", default="",
                    help="internal: run a single 'model:batch' cell and exit")
    args = ap.parse_args()

    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    if args.one:
        m, b = args.one.rsplit(":", 1)
        print(json.dumps(bench_one(m, int(b), args.iters, args.windows,
                                   quantize=args.quantize, tta=args.tta,
                                   tta_scales=args.tta_scales)),
              flush=True)
        return

    rows = []
    for m in args.models.split(","):
        for b in (int(x) for x in args.batches.split(",")):
            row = _run_cell_subprocess(m.strip(), b, args.iters,
                                       args.windows, quantize=args.quantize,
                                       tta=args.tta,
                                       tta_scales=args.tta_scales)
            print(json.dumps(row), flush=True)
            rows.append(row)

    print("\n| model | size | batch | ms/batch | images/sec/chip |")
    print("|---|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['model']} | — | {r['batch']} | ERROR | — |")
        else:
            print(f"| {r['model']} | {r['image_size']} | {r['batch']} "
                  f"| {r['ms_per_batch']} | {r['images_per_sec_per_chip']} |")


if __name__ == "__main__":
    main()
