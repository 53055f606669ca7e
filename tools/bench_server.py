"""Load-test the HTTP detection server (server.py): throughput and latency
percentiles under concurrent clients, on the real chip.

Starts an in-process DetectionServer over a Predictor (so the measurement
includes HTTP + dynamic batching + device dispatch), fires N concurrent
client threads each posting a JPEG repeatedly, and reports img/s + p50/p90/
p99 request latency per (clients, quantize-tier) cell.

    python tools/bench_server.py --clients 1,8,32 --requests 64 \
        [--quantize full-static] [--batch-size 16]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import (
    honor_jax_platforms_env,
)

honor_jax_platforms_env()


def main(argv=None):
    import numpy as np

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config2_retinanet_r50_infer")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--batch-window-ms", type=float, default=5.0)
    p.add_argument("--clients", default="1,8,32")
    p.add_argument("--requests", type=int, default=64,
                   help="requests per client")
    p.add_argument("--quantize", default="",
                   choices=["", "weights", "full", "full-static"])
    p.add_argument("--image-px", type=int, default=640,
                   help="source image edge (decoded+resized per request)")
    p.add_argument("--loopback", action="store_true",
                   help="substitute each assembled batch with a pre-staged "
                        "device-resident tensor (zero H2D) — measures the "
                        "server's own overhead ceiling on hosts whose "
                        "transfer path dominates (see BASELINE.md)")
    p.add_argument("--no-buckets", dest="buckets", action="store_false",
                   help="disable batch-size bucketing (pad everything to "
                        "--batch-size)")
    args = p.parse_args(argv)

    from PIL import Image

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.serving import Predictor
    from shape_based_object_detection_tpu.server import DetectionServer
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = config_lib.get_config(args.config)

    quantize = args.quantize
    act_scales = None
    if quantize == "full-static":
        from shape_based_object_detection_tpu.models.factory import (
            build_model,
        )
        from shape_based_object_detection_tpu.quantize import (
            calibrate_activation_scales,
        )

        module, variables, _ = build_model(cfg.model)
        s = cfg.model.image_size
        calib = np.random.default_rng(0).integers(
            0, 255, (args.batch_size, s, s, 3), dtype=np.uint8)
        act_scales = calibrate_activation_scales(module, variables, [calib],
                                                 cfg.data)
        quantize = "full"

    from shape_based_object_detection_tpu.serving import default_bucket_sizes

    buckets = default_bucket_sizes(args.batch_size) if args.buckets else None
    pred = Predictor(cfg, batch_size=args.batch_size, quantize=quantize,
                     activation_scales=act_scales, bucket_sizes=buckets)
    pred.warmup()  # compile every bucket up front

    if args.loopback:
        # Transfer-free ceiling (round-2 verdict item 6): this environment's
        # tunneled chip caps host->device at ~10 MB/s, so the end-to-end
        # numbers measure the TUNNEL, not the server. Substitute each
        # assembled batch with a pre-staged DEVICE-resident tensor of the
        # same bucket shape (jnp.asarray of a committed device array is a
        # no-op -> zero H2D), keeping HTTP, request-thread decode, the
        # batcher, dispatch and compute all in the measurement. Detections
        # come from the staged pixels — a ceiling probe, not an accuracy
        # path.
        import jax

        import shape_based_object_detection_tpu.serving as serving_mod

        real_prepare = serving_mod.prepare_batch
        staged: dict = {}

        def staged_prepare(images, size, batch_size, letterbox=False,
                           decode_backend="auto"):
            batch, sizes = real_prepare(images, size, batch_size,
                                        letterbox, decode_backend)
            if batch_size not in staged:
                staged[batch_size] = jax.device_put(batch)
            return staged[batch_size], sizes

        # Predictor methods resolve prepare_batch through serving's module
        # globals at call time, so rebinding here covers submit/predict.
        serving_mod.prepare_batch = staged_prepare

    server = DetectionServer(pred, port=0,
                             batch_window_ms=args.batch_window_ms)
    server.start()
    url = f"http://127.0.0.1:{server.port}/detect?min_score=0.3"

    rng = np.random.default_rng(0)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(
        0, 255, (args.image_px, args.image_px, 3)).astype(np.uint8)).save(
            buf, format="JPEG")
    body = buf.getvalue()

    def one_request():
        req = urllib.request.Request(
            url, data=body, headers={"Content-Type": "image/jpeg"})
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            r.read()

    one_request()  # end-to-end warmup

    rows = []
    for n_clients in (int(x) for x in args.clients.split(",")):
        lat = []
        lock = threading.Lock()

        def client():
            for _ in range(args.requests):
                t0 = time.perf_counter()
                one_request()
                dt = time.perf_counter() - t0
                with lock:
                    lat.append(dt)

        threads = [threading.Thread(target=client)
                   for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        lat_ms = np.sort(np.asarray(lat)) * 1e3
        row = {
            "clients": n_clients,
            "quantize": args.quantize or "bf16",
            "images_per_sec": round(len(lat) / wall, 1),
            "p50_ms": round(float(np.percentile(lat_ms, 50)), 1),
            "p90_ms": round(float(np.percentile(lat_ms, 90)), 1),
            "p99_ms": round(float(np.percentile(lat_ms, 99)), 1),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    server.close()
    print("\n| clients | tier | img/s | p50 ms | p90 ms | p99 ms |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['clients']} | {r['quantize']} | {r['images_per_sec']} "
              f"| {r['p50_ms']} | {r['p90_ms']} | {r['p99_ms']} |")


if __name__ == "__main__":
    main()
