"""Input-pipeline throughput benchmark (the config #3/#4 training
bottleneck — BASELINE.md "input supply, not the device").

Builds a disposable on-disk JPEG dataset (so the per-sample cost includes
real libjpeg decode + PIL resize, like VOC/COCO), then measures images/sec
of each loader variant:

  threads  - built-in Loader with a thread pool (reference DataLoader analog)
  grain    - grain with N worker PROCESSES (decode off the training process)
  cache    - one-time pre-decode into a memmap cache, then vectorized gathers

    python tools/bench_loader.py --images 256 --size 512 --batch 16 --workers 8

Prints one JSON line per variant. Compare against the device demand
(bench_train.py: ~225 img/s for R50-512 b16 on the v5e).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


class JpegFolderDetection:
    """Minimal dataset with the real host cost profile: JPEG decode +
    BILINEAR resize per sample (what VOC/COCO-backed training pays)."""

    def __init__(self, root: str, n: int, size: int,
                 decode_backend: str = "auto"):
        from shape_based_object_detection_tpu.utils.image import (
            effective_decode_backend,
        )

        self.paths = [os.path.join(root, f"{i}.jpg") for i in range(n)]
        self.size = size
        # resolved like VOC/COCO do: "native" fails loud if the lib can't
        # build (a silent PIL fallback would mislabel the measurement)
        self.decode_backend = effective_decode_backend(decode_backend)
        self.boxes = np.asarray([[0.2, 0.2, 0.8, 0.8]], np.float32)
        self.labels = np.asarray([1], np.int32)

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i):
        from shape_based_object_detection_tpu.utils.image import (
            load_resized_image_host,
        )

        img, _, _ = load_resized_image_host(
            self.paths[i], self.size, backend=self.decode_backend)
        return img, self.boxes, self.labels


def _measure(loader, epochs: int, batch: int) -> float:
    n_img = 0
    # warmup epoch populates page cache / worker pools
    for b in loader.batches(epoch=0):
        pass
    t0 = time.perf_counter()
    for e in range(1, 1 + epochs):
        for b in loader.batches(epoch=e):
            n_img += batch
    return n_img / (time.perf_counter() - t0)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=256)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--variants", default="threads,grain,cache")
    p.add_argument("--decode-backend", default="auto",
                   choices=["auto", "native", "pil"],
                   help="host JPEG decode path (DataConfig.decode_backend)")
    args = p.parse_args(argv)

    from PIL import Image

    from shape_based_object_detection_tpu.data.cache import (
        CacheLoader, MemmapDetection, build_cache,
    )
    from shape_based_object_detection_tpu.data.grain_pipeline import GrainLoader
    from shape_based_object_detection_tpu.data.pipeline import Loader

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as tmp:
        # natural-ish images (smooth gradients + noise) so JPEG decode cost
        # is realistic, at a source resolution typical of COCO (640x480)
        for i in range(args.images):
            y, x = np.mgrid[0:480, 0:640]
            img = np.stack([
                (x * 0.3 + i) % 256, (y * 0.4) % 256, ((x + y) * 0.2) % 256,
            ], -1).astype(np.uint8)
            img = np.clip(
                img + rng.integers(0, 30, img.shape, dtype=np.uint8), 0, 255)
            Image.fromarray(img).save(os.path.join(tmp, f"{i}.jpg"),
                                      quality=90)
        ds = JpegFolderDetection(tmp, args.images, args.size,
                                 decode_backend=args.decode_backend)

        results = {}
        variants = args.variants.split(",")
        if "threads" in variants:
            loader = Loader(ds, args.batch, 8, workers=args.workers)
            results["threads"] = _measure(loader, args.epochs, args.batch)
            loader.close()
        if "grain" in variants:
            loader = GrainLoader(ds, args.batch, 8, workers=args.workers)
            results["grain"] = _measure(loader, args.epochs, args.batch)
        if "cache" in variants:
            t0 = time.perf_counter()
            cache_dir = os.path.join(tmp, "cache")
            build_cache(ds, cache_dir, max_boxes=8, workers=args.workers)
            build_s = time.perf_counter() - t0
            loader = CacheLoader(MemmapDetection(cache_dir), args.batch, 8)
            results["cache"] = _measure(loader, args.epochs, args.batch)
            results["cache_build_s"] = build_s

        for k, v in results.items():
            print(json.dumps({
                "metric": f"loader_{k}",
                "value": round(v, 1),
                "unit": "images/sec" if not k.endswith("_s") else "sec",
                "config": {"images": args.images, "size": args.size,
                           "batch": args.batch, "workers": args.workers,
                           # the RESOLVED backend (what actually ran)
                           "decode_backend": ds.decode_backend},
            }))


if __name__ == "__main__":
    main()
