"""Hflip-TTA accuracy ablation: train a detector on synthetic data, then
evaluate the SAME weights with and without hflip test-time augmentation
(model.detect.tta_hflip) and report both mAPs.

This quantifies the accuracy side of the TTA cost recorded in BASELINE.md
(2.08x batch time): classic detection repos ship flip-TTA as an eval-time
accuracy knob, so the first-party contract is measured mAP, not folklore.
Training keeps random hflip augmentation ON so flipped inputs are
in-distribution for the flipped branch.

    python tools/ablate_tta.py --steps 400 [--config tiny_retinanet]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import (
    honor_jax_platforms_env,
)

honor_jax_platforms_env()


def main(argv=None):
    import jax.numpy as jnp

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.data.synthetic import (
        SyntheticDetection,
    )
    from shape_based_object_detection_tpu.detection import make_detect_fn
    from shape_based_object_detection_tpu.eval import Evaluator
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="tiny_retinanet")
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--train-images", type=int, default=16)
    p.add_argument("--eval-images", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args(argv)

    enable_compilation_cache()
    cfg = config_lib.get_config(args.config)
    cfg = dataclasses.replace(
        cfg,
        # hflip aug stays ON (see module docstring); the geometric/photo
        # ops are off to keep the tiny run converging fast
        data=dataclasses.replace(cfg.data, batch_size=args.batch,
                                 photometric=False, expand=False,
                                 random_crop=False, hflip=True),
        train=dataclasses.replace(cfg.train, base_lr=0.02, warmup_steps=10),
        model=dataclasses.replace(
            cfg.model,
            detect=dataclasses.replace(cfg.model.detect,
                                       score_threshold=0.05)),
    )
    module, variables, anchors = build_model(cfg.model)
    state = train_lib.create_train_state(module, variables, cfg)
    step_fn = train_lib.make_train_step(module, anchors, cfg, augment=True)

    ds = SyntheticDetection(size=cfg.model.image_size,
                            num_images=args.train_images,
                            num_classes=cfg.model.num_classes)
    loader = Loader(ds, args.batch, cfg.data.max_boxes, shuffle=True)
    print(f"training {args.steps} steps on {args.train_images} synthetic "
          "images (hflip aug on)...", flush=True)
    it, epoch = iter(loader.batches(epoch=0)), 0
    for i in range(args.steps):
        try:
            batch = next(it)
        except StopIteration:
            epoch += 1
            it = iter(loader.batches(epoch=epoch))
            batch = next(it)
        state, metrics = step_fn(state, batch._asdict())
        if i % 100 == 0:
            print(f"  step {i}: loss {float(metrics['loss']):.4f}",
                  flush=True)
    trained = {"params": state.params, **state.extra_vars}

    eval_ds = SyntheticDetection(size=cfg.model.image_size,
                                 num_images=args.eval_images,
                                 num_classes=cfg.model.num_classes,
                                 seed=1234)
    eval_loader = Loader(eval_ds, args.batch, cfg.data.max_boxes,
                         shuffle=False)

    def eval_mode(tta: bool):
        mcfg = dataclasses.replace(
            cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                                  tta_hflip=tta))
        detect = make_detect_fn(module, anchors, mcfg, cfg.data)
        ev = Evaluator(area_scale=cfg.model.image_size)
        for b in eval_loader.batches():
            det = detect(trained, jnp.asarray(b.images))
            ev.add_batch(det, b.boxes, b.labels - 1, b.valid)
        coco, voc = ev.coco(), ev.voc()
        return {"coco_mAP": round(coco["mAP"], 4),
                "AP50": round(coco["AP50"], 4),
                "AR100": round(coco["AR100"], 4),
                "voc_mAP": round(voc["mAP"], 4)}

    def eval_multiscale(scales, hflip: bool = False):
        """Multi-scale TTA arm (second classic TTA axis; retinanet-family
        only — SSD's extras plan is image_size-dependent). Per-image
        MultiScaleDetector path (the production detect_cli --tta-scales
        machinery), detections mapped back to the eval frame."""
        import numpy as np
        import types

        from shape_based_object_detection_tpu.detection import (
            MultiScaleDetector,
        )

        mcfg = dataclasses.replace(
            cfg.model, detect=dataclasses.replace(cfg.model.detect,
                                                  tta_hflip=hflip))
        msd = MultiScaleDetector(mcfg, trained, scales, cfg.data)
        ev = Evaluator(area_scale=cfg.model.image_size)
        s = cfg.model.image_size
        for i in range(len(eval_ds)):
            img, gt_boxes, gt_labels = eval_ds[i]
            boxes_px, scores, labels = msd(img)
            n = len(scores)
            det = types.SimpleNamespace(
                boxes=(np.asarray(boxes_px, np.float32) / s).reshape(1, n, 4),
                scores=np.asarray(scores, np.float32).reshape(1, n),
                labels=np.asarray(labels, np.int32).reshape(1, n),
                valid=np.ones((1, n), bool))
            ev.add_batch(det, gt_boxes[None], gt_labels[None] - 1,
                         np.ones((1, len(gt_labels)), bool))
        coco, voc = ev.coco(), ev.voc()
        return {"coco_mAP": round(coco["mAP"], 4),
                "AP50": round(coco["AP50"], 4),
                "AR100": round(coco["AR100"], 4),
                "voc_mAP": round(voc["mAP"], 4)}

    rows = {}
    for name, tta in (("plain", False), ("hflip-tta", True)):
        rows[name] = eval_mode(tta)
        print(json.dumps({"mode": name, **rows[name]}), flush=True)
    if cfg.model.family == "retinanet":
        s = cfg.model.image_size
        scales = (s, max(32, round(s * 1.25 / 32) * 32))
        rows[f"ms-tta{list(scales)}"] = eval_multiscale(scales)
        print(json.dumps({"mode": f"ms-tta{list(scales)}",
                          **rows[f"ms-tta{list(scales)}"]}), flush=True)
        rows["ms+hflip-tta"] = eval_multiscale(scales, hflip=True)
        print(json.dumps({"mode": "ms+hflip-tta",
                          **rows['ms+hflip-tta']}), flush=True)

    print("\n| mode | COCO mAP | AP50 | AR100 | VOC mAP |")
    print("|---|---|---|---|---|")
    for name, r in rows.items():
        print(f"| {name} | {r['coco_mAP']} | {r['AP50']} | {r['AR100']} "
              f"| {r['voc_mAP']} |")
    base = rows["plain"]["coco_mAP"]
    for name, r in rows.items():
        if name != "plain":
            print(f"{name} coco mAP delta vs plain: "
                  f"{r['coco_mAP'] - base:+.4f}")


if __name__ == "__main__":
    main()
