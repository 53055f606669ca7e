"""Headline benchmark: RetinaNet R50-FPN 512px images/sec/chip (the
BASELINE.json north-star metric, config #2), compared to the torch-CPU
reference implementation of the same architecture.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"train_images_per_sec", "best_tier_images_per_sec"}. The headline
metric/value stay the bf16 end-to-end detect() throughput (comparable
across rounds); the extra keys carry the REST of the north star —
BASELINE.json:2 names "train and infer" — and the best serving tier
(static-calibration int8, the b16 throughput champion), so the driver
artifact records all three without changing its last-line parse.

The torch-CPU baseline is measured once and cached in BASELINE_MEASURED.json
(measuring it takes ~a minute on one core); delete the cache to re-measure.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time

REPO = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")
# TPU-side batch: 16 is the measured throughput knee for this program
# (tools/bench_matrix.py: b8 770, b16 ~805, b32 767 img/s); the torch-CPU
# denominator below still uses the golden's own best accounting.
BATCH = 16
SIZE = 512


def measure_torch_baseline() -> dict:
    """images/sec of the torch-CPU golden RetinaNet R50 at 512px.

    Both batch-1 (latency accounting) and batch-8 (the golden's best
    throughput accounting) are measured, each over >= 20 images, so the
    headline ratio does not rest on a 3-iteration sample (VERDICT r1 weak
    #5). The TPU side runs BATCH (16); vs_baseline divides by the BETTER of
    the two torch numbers — the conservative ratio."""
    import numpy as np
    import torch

    import sys

    sys.path.insert(0, REPO)
    from tests.golden.torch_models import TorchRetinaNet

    torch.set_num_threads(os.cpu_count() or 1)
    model = TorchRetinaNet(variant="resnet50", num_classes=80).eval()
    rng = np.random.default_rng(0)

    def run(batch: int, iters: int) -> float:
        # b1 = latency accounting; b8 = the golden's own best throughput
        # accounting (the TPU side runs BATCH=16; vs_baseline divides by the
        # torch golden's best of b1/b8, the conservative ratio)
        x = torch.from_numpy(
            rng.uniform(-1, 1, (batch, 3, SIZE, SIZE)).astype("float32"))
        with torch.no_grad():
            model(x)  # warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                model(x)
            dt = (time.perf_counter() - t0) / iters
        return batch / dt

    return {
        "torch_cpu_retinanet_r50_512_images_per_sec": run(1, 20),
        "torch_cpu_retinanet_r50_512_b8_images_per_sec": run(8, 4),
    }


def get_baseline() -> dict:
    if os.path.exists(CACHE):
        with open(CACHE) as f:
            d = json.load(f)
        if "torch_cpu_retinanet_r50_512_b8_images_per_sec" in d:
            return d
    d = measure_torch_baseline()
    d["note"] = ("torch-CPU golden RetinaNet R50-FPN, 512px, this host; "
                 "b1 over 20 iters, b8 over 4 iters (32 images); the "
                 "PyTorch-CPU reference stand-in (reference repo mount was "
                 "empty — SURVEY.md §0)")
    with open(CACHE, "w") as f:
        json.dump(d, f, indent=2)
    return d


def measure_train_ips() -> float:
    """Full train_step throughput, R50-FPN 512px b16 bf16 (bench_train.py's
    exact configuration, fewer iterations): device-resident batch, iterations
    chained through the donated state, scalar-readback stop, RTT subtracted."""
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.models.factory import build_model

    cfg = config_lib.get_config("config4_retinanet_r101_coco_train")
    model_cfg = dataclasses.replace(config_lib.RETINANET_R50_512,
                                    dtype="bfloat16")
    cfg = dataclasses.replace(
        cfg, model=model_cfg,
        data=dataclasses.replace(cfg.data, batch_size=BATCH, max_boxes=64))
    module, variables, anchors = build_model(model_cfg)
    state = train_lib.create_train_state(module, variables, cfg)
    step = train_lib.make_train_step(module, anchors, cfg)

    rng = np.random.default_rng(0)
    g = cfg.data.max_boxes
    batch = {
        "images": jnp.asarray(rng.integers(
            0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)),
        "boxes": jnp.asarray(np.tile(np.asarray(
            [0.2, 0.2, 0.7, 0.7], np.float32), (BATCH, g, 1))),
        "labels": jnp.asarray(
            rng.integers(1, 81, (BATCH, g)).astype(np.int32)),
        "valid": jnp.asarray(np.tile(
            np.asarray([True] * 8 + [False] * (g - 8)), (BATCH, 1))),
    }
    state, metrics = step(state, dict(batch))  # compile
    _ = float(metrics["loss"])
    n = 12
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, dict(batch))
    _ = float(metrics["loss"])
    t1 = time.perf_counter()
    r0 = time.perf_counter()
    _ = float(metrics["loss_cls"])
    rtt = time.perf_counter() - r0
    return BATCH / ((t1 - t0 - rtt) / n)


def measure_best_tier_ips() -> float:
    """Best serving tier: static-calibration full-int8 (s8xs8->s32 convs on
    the MXU, calibrated per-conv activation scales as compile-time
    constants) at b16 — measured +19% over bf16 (BASELINE.md)."""
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.quantize import (
        calibrate_activation_scales, make_serving_detect,
    )

    cfg = config_lib.get_config("config2_retinanet_r50_infer")
    model_cfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    module, variables, anchors = build_model(model_cfg)
    rng = np.random.default_rng(0)
    images_np = rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    act_scales = calibrate_activation_scales(
        module, variables, [images_np], cfg.data)
    detect, variables = make_serving_detect(
        module, anchors, model_cfg, cfg.data, variables, "full",
        activation_scales=act_scales)

    images = jnp.asarray(images_np)
    out = detect(variables, images)
    _ = float(out.scores[0, 0])
    dep = (out.labels[0, 0] * 0).astype(images.dtype)
    out = detect(variables, images + dep)
    _ = float(out.scores[0, 0])
    _ = float(out.scores[0, 1])
    n = 15
    best_dt = float("inf")
    for _window in range(2):
        t0 = time.perf_counter()
        for _ in range(n):
            dep = (out.labels[0, 0] * 0).astype(images.dtype)
            out = detect(variables, images + dep)
        _ = float(out.scores[0, 0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(out.scores[0, 1])
        rtt = time.perf_counter() - r0
        best_dt = min(best_dt, (t1 - t0 - rtt) / n)
    return BATCH / best_dt


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.detection import make_detect_fn

    baseline = get_baseline()
    baseline_ips = baseline["torch_cpu_retinanet_r50_512_images_per_sec"]
    baseline_b8 = baseline["torch_cpu_retinanet_r50_512_b8_images_per_sec"]

    cfg = config_lib.get_config("config2_retinanet_r50_infer")
    model_cfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    module, variables, anchors = build_model(model_cfg)
    detect = make_detect_fn(module, anchors, model_cfg, cfg.data)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8)
    )

    # Timing methodology: on the tunneled TPU runtime block_until_ready can
    # return before execution and independent calls pipeline, so each
    # iteration data-depends on the previous one and the clock stops on a
    # scalar readback; a bare-readback RTT is subtracted.
    out = detect(variables, images)  # compile + warmup
    _ = float(out.scores[0, 0])
    # warm the dependent-iteration path too (the images+dep add is its own
    # executable; remote compiles inside the timed region would dominate)
    dep = (out.labels[0, 0] * 0).astype(images.dtype)
    out = detect(variables, images + dep)
    _ = float(out.scores[0, 0])
    # ... and the RTT probe's (0,1) gather: it is a DIFFERENT cached
    # executable from the (0,0) slice above; cold-compiling it inside the
    # timed rtt measurement would inflate the subtracted RTT (and the
    # reported img/s) for whichever window hits it first
    _ = float(out.scores[0, 1])

    n = 20
    best_dt = float("inf")
    for _window in range(3):  # best-of-3 windows: damp tunnel/host jitter
        t0 = time.perf_counter()
        for _ in range(n):
            dep = (out.labels[0, 0] * 0).astype(images.dtype)  # serialize iters
            out = detect(variables, images + dep)
        _ = float(out.scores[0, 0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(out.scores[0, 1])  # already materialized -> pure RTT
        rtt = time.perf_counter() - r0
        best_dt = min(best_dt, (t1 - t0 - rtt) / n)
    ips = BATCH / best_dt

    # The rest of the north star (BASELINE.json:2 says "train and infer")
    # plus the best serving tier, as extra keys on the SAME line. A failure
    # in either must not cost the headline number: emit null and keep going.
    extras = {}
    for key, fn in (("train_images_per_sec", measure_train_ips),
                    ("best_tier_images_per_sec", measure_best_tier_ips)):
        try:
            extras[key] = round(fn(), 2)
        except Exception:
            import traceback

            traceback.print_exc()
            extras[key] = None

    print(json.dumps({
        "metric": "retinanet_r50_fpn_512px_infer_images_per_sec_per_chip",
        "value": round(ips, 2),
        "unit": "images/sec",
        # conservative accounting: TPU BATCH(=16) throughput vs the torch
        # golden's BEST accounting (its b8 throughput beats its b1); the
        # b1-vs-b1 ratio is strictly larger
        "vs_baseline": round(ips / max(baseline_ips, baseline_b8), 2),
        **extras,
    }))


def _probe_backend(timeout_s: float = 120.0) -> bool:
    """True if a fresh backend client comes up within timeout_s.

    The tunneled axon runtime's known failure mode is an indefinite hang
    inside make_c_api_client — not an exception — so a hung main process
    would never reach the retry below. Probing in a subprocess bounds it."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            capture_output=True, timeout=timeout_s)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def _start_watchdog(budget_s: float) -> None:
    """Hard-exit if the bench has not finished within budget_s (a client
    that hangs AFTER the probe succeeded). Cold compile over the tunnel is
    5-9 min, so the budget must comfortably exceed that."""
    import threading

    def fire():
        import sys

        sys.stderr.write(
            f"bench.py watchdog: no result after {budget_s:.0f}s — the TPU "
            "tunnel is wedged mid-run (known axon failure mode); aborting "
            "so the caller gets a fast, diagnosable failure.\n")
        sys.stderr.flush()
        os._exit(3)

    t = threading.Timer(budget_s, fire)
    t.daemon = True
    t.start()


if __name__ == "__main__":
    import sys

    for attempt in range(3):
        if _probe_backend():
            break
        if attempt < 2:
            time.sleep(60)  # transient tunnel blips recover within minutes
    else:
        sys.stderr.write(
            "bench.py: TPU backend unavailable — a fresh client failed to "
            "initialize within 120s on 3 probes over ~6 min (known tunnel "
            "hang, see STATUS.md 'Infra flakiness'). No measurement taken; "
            "re-run when `python -c 'import jax; jax.devices()'` responds.\n")
        sys.exit(2)
    # budget: cold compile over the tunnel is 5-9 min PER program and main()
    # now compiles three (detect, train_step, int8 detect); a worker-crash
    # retry re-runs main() warm — 45 min covers the worst legitimate path
    # while still bounding a wedged run
    _start_watchdog(2700.0)
    try:
        main()
    except Exception:  # the tunneled TPU worker occasionally crashes/restarts
        import traceback

        traceback.print_exc()
        time.sleep(10)
        main()
