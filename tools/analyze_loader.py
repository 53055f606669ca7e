"""Why the cacheless loader tiers measure what they measure on THIS host
(round-2 verdict item 5: "fix or retire the grain tier; get a cacheless
path to device demand").

The decisive fact is the host's CPU core count. The fused C decoder
releases the GIL, so the threads tier scales with cores; grain's worker
processes pay a per-record pickle+pipe copy of the decoded sample on top
of the same decode work. On a single-core host (this environment: nproc=1)
NO amount of workers of either kind can beat one core's decode throughput,
and the process tier must lose to threads by exactly its IPC overhead.

This tool measures the decomposition directly:
  1. single-thread decode+resize ms/img (C path and PIL) -> the 1-core
     ceiling of any cacheless loader;
  2. the pickle+pipe round-trip cost of one decoded (S,S,3) sample ->
     grain's per-record overhead;
  3. the threads tier at workers=1 vs workers=N (flat iff cores=1);
  4. the projected core count at which the threads tier meets a given
     device demand (default: the R50-512 b16 train step's ~247 img/s).

    python tools/analyze_loader.py --images 128 --size 512 [--grain]

Prints one JSON line; BASELINE.md records the 2026-08-19 result.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import pickle
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import (
    honor_jax_platforms_env,
)

honor_jax_platforms_env()

import numpy as np


def build_jpeg_set(root: str, n: int, src_px: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 255, (src_px, src_px, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(root, f"{i}.jpg"), quality=90)


def time_per_image(fn, paths, reps: int = 2) -> float:
    fn(paths[0])  # warm (page cache, lib init)
    t0 = time.perf_counter()
    cnt = 0
    for _ in range(reps):
        for p in paths:
            fn(p)
            cnt += 1
    return (time.perf_counter() - t0) / cnt * 1000.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--src-px", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--device-demand", type=float, default=247.0,
                   help="img/s the device consumes (bench_train.py)")
    p.add_argument("--grain", action="store_true",
                   help="also measure the grain worker-process tier "
                        "(slow to start; needs the grain package)")
    args = p.parse_args(argv)

    from tools.bench_loader import JpegFolderDetection
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.utils.image import (
        load_resized_image_host,
    )

    out: dict = {"metric": "loader_decomposition",
                 "host_cores": os.cpu_count(),
                 "images": args.images, "size": args.size,
                 "src_px": args.src_px}

    with tempfile.TemporaryDirectory() as root:
        build_jpeg_set(root, args.images, args.src_px)
        paths = [os.path.join(root, f"{i}.jpg") for i in range(args.images)]

        # 1. single-thread decode ceilings
        ms_c = time_per_image(
            lambda q: load_resized_image_host(q, args.size, backend="native"),
            paths)
        ms_pil = time_per_image(
            lambda q: load_resized_image_host(q, args.size, backend="pil"),
            paths)
        out["decode_ms_native"] = round(ms_c, 2)
        out["decode_ms_pil"] = round(ms_pil, 2)
        out["one_core_ceiling_img_s"] = round(1000.0 / ms_c, 1)

        # 2. grain's per-record IPC floor: pickle + pipe round-trip of one
        # decoded sample (what each worker->parent record costs on top of
        # the decode itself). A pipe write/read of the pickled bytes is the
        # mechanism grain/multiprocessing uses for result transport.
        sample = (np.zeros((args.size, args.size, 3), np.uint8),
                  np.zeros((8, 4), np.float32), np.zeros((8,), np.int32))
        # (measured as serialize + deserialize memcpy cost — a BytesIO
        # stand-in for the pipe: same copy count, no blocking semantics)
        t0 = time.perf_counter()
        reps = 50
        for _ in range(reps):
            buf = pickle.dumps(sample, protocol=pickle.HIGHEST_PROTOCOL)
            pickle.load(io.BytesIO(buf))
        out["ipc_ms_per_sample"] = round(
            (time.perf_counter() - t0) / reps * 1000.0, 2)

        # 3. threads tier at 1 and N workers
        def thread_tier(workers: int) -> float:
            ds = JpegFolderDetection(root, args.images, args.size)
            loader = Loader(ds, args.batch, max_boxes=8, workers=workers)
            for _ in loader.batches(epoch=0):  # warm
                pass
            t0 = time.perf_counter()
            n = 0
            for b in loader.batches(epoch=1):
                n += args.batch
            loader.close()
            return n / (time.perf_counter() - t0)

        out["threads_1_img_s"] = round(thread_tier(1), 1)
        out[f"threads_{args.workers}_img_s"] = round(
            thread_tier(args.workers), 1)

        if args.grain:
            from shape_based_object_detection_tpu.data.grain_pipeline import (
                GrainLoader,
            )

            ds = JpegFolderDetection(root, args.images, args.size)
            gl = GrainLoader(ds, args.batch, max_boxes=8,
                             workers=min(args.workers, 4))
            for _ in gl.batches(epoch=0):
                pass
            t0 = time.perf_counter()
            n = 0
            for b in gl.batches(epoch=1):
                n += args.batch
            gl.close()
            out["grain_img_s"] = round(n / (time.perf_counter() - t0), 1)

    # 4. projection: cores needed for the threads tier to feed the device
    # (decode releases the GIL -> near-linear until memory bandwidth)
    per_img_ms = 1000.0 / out[f"threads_{args.workers}_img_s"]
    out["cores_to_meet_device_demand"] = round(
        args.device_demand * per_img_ms / 1000.0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
