"""Host-side eval throughput benchmark (component C19 evidence).

Measures the full coco_map pipeline — grouping, greedy COCOeval-protocol
matching over all IoU thresholds AND all area strata, AP/AR accumulation —
on synthetic COCO-scale record sets, for both the native C++ matcher and
the pure-Python fallback. This is the host-side cost of an eval pass after
the device has produced detections (SURVEY.md §3.3: one D2H copy per batch,
then numpy); pycocotools fills this role in the reference stack.

    python tools/bench_eval.py [--images 1000] [--dets 100] [--classes 80]

Prints one JSON line per path: images/sec of metric computation.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_records(n_images: int, dets_per_img: int, n_classes: int, seed=0):
    from shape_based_object_detection_tpu.eval.ap import (
        DetectionRecord, GroundTruthRecord,
    )

    rng = np.random.default_rng(seed)
    dets, gts = [], []
    for img in range(n_images):
        g = int(rng.integers(2, 16))
        c = rng.uniform(0.1, 0.9, (g, 2))
        wh = rng.uniform(0.02, 0.4, (g, 2))
        gb = np.concatenate([c - wh / 2, c + wh / 2], 1).astype(np.float32)
        gl = rng.integers(1, n_classes + 1, g)
        gts.append(GroundTruthRecord(
            img, gb, gl, rng.uniform(size=g) < 0.05,
            area_factor=640.0 * 480.0))
        d = dets_per_img
        db = (gb[rng.integers(0, g, d)]
              + rng.normal(0, 0.02, (d, 4)).astype(np.float32))
        dets.append(DetectionRecord(
            img, db, rng.uniform(0.05, 1.0, d).astype(np.float32),
            rng.integers(1, n_classes + 1, d)))
    return dets, gts


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=1000)
    p.add_argument("--dets", type=int, default=100)
    p.add_argument("--classes", type=int, default=80)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    from shape_based_object_detection_tpu.eval.ap import coco_map
    from shape_based_object_detection_tpu.utils import native

    dets, gts = make_records(args.images, args.dets, args.classes)

    def run(label: str):
        best = float("inf")
        m = None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            m = coco_map(dets, gts, area_scale=1.0)
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({
            "metric": f"coco_map_host_eval_images_per_sec_{label}",
            "value": round(args.images / best, 1),
            "unit": "images/sec",
            "seconds": round(best, 3),
            "mAP": round(m["mAP"], 4),
            "images": args.images,
            "dets_per_image": args.dets,
            "classes": args.classes,
        }))

    if native.load_ap_matcher() is not None:
        run("native")
        # force the pure-Python reference loop for comparison
        native.match_class_strata_native = lambda *a, **k: None
        run("python")
    else:
        run("python_only")


if __name__ == "__main__":
    main()
