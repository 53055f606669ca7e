"""Analyze IoU-only vs shape-aware anchor matching (the research feature).

Reports, for a sweep of shape_weight values, how matching statistics change
on synthetic box distributions: positives per GT, mean matched-anchor shape
agreement, and how many extreme-aspect GTs get >=1 threshold-positive anchor.
The shape term rescues thin/elongated objects whose best-IoU anchors sit just
under the positive threshold but have the right aspect ratio.

    python tools/matching_analysis.py --model retinanet_r50_fpn
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def main(argv=None):
    import jax.numpy as jnp

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.config import MatchConfig
    from shape_based_object_detection_tpu.ops import anchors as anchor_lib
    from shape_based_object_detection_tpu.ops import boxes as box_ops
    from shape_based_object_detection_tpu.ops.matching import match_anchors

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="retinanet_r50_fpn")
    p.add_argument("--num-gt", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = config_lib.get_config(args.model)
    anchors = anchor_lib.anchors_for_model(cfg.model)

    rng = np.random.default_rng(args.seed)
    # synthetic GT with a heavy tail of extreme aspect ratios
    cxcy = rng.uniform(0.25, 0.75, (args.num_gt, 2))
    area = rng.uniform(0.004, 0.04, (args.num_gt,))
    log_ar = rng.normal(0.0, 1.2, (args.num_gt,))  # aspect w/h = e^log_ar
    w = np.sqrt(area * np.exp(log_ar))
    h = np.sqrt(area / np.exp(log_ar))
    gt = np.stack([cxcy[:, 0] - w / 2, cxcy[:, 1] - h / 2,
                   cxcy[:, 0] + w / 2, cxcy[:, 1] + h / 2], 1).astype(np.float32)
    gt = np.clip(gt, 0, 1)
    extreme = np.abs(log_ar) > 1.5

    print(f"{args.num_gt} synthetic GT on {anchors.shape[0]} {args.model} anchors"
          f" ({extreme.sum()} with extreme aspect)")
    print(f"{'shape_w':>8} {'pos/gt':>8} {'gt w/ pos':>10} {'extreme w/ pos':>15}")
    for shape_w in (0.0, 0.1, 0.2, 0.3, 0.5):
        mc = MatchConfig(pos_threshold=0.5, neg_threshold=0.4,
                         shape_weight=shape_w, shape_tau=1.0,
                         force_match_for_each_gt=False)
        res = match_anchors(
            anchors, jnp.asarray(gt),
            jnp.ones(args.num_gt, jnp.int32), jnp.ones(args.num_gt, bool),
            mc, cfg.model.anchors.variances)
        pos = np.asarray(res.positive)
        matched = np.asarray(res.matched_gt_idx)
        counts = np.bincount(matched[pos], minlength=args.num_gt)
        print(f"{shape_w:>8.1f} {counts.mean():>8.2f} "
              f"{(counts > 0).mean() * 100:>9.1f}% "
              f"{(counts[extreme] > 0).mean() * 100:>14.1f}%")


if __name__ == "__main__":
    main()
