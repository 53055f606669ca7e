"""Evaluation entry point (the reference's ``eval.py`` analog, SURVEY.md §3.3).

Runs the jitted detect path over a validation set and reports first-party
COCO AP[.5:.95] / VOC mAP.
"""

from __future__ import annotations

import argparse
import json

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.detection import make_detect_fn
    from shape_based_object_detection_tpu.eval import Evaluator
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.cli.train_cli import build_dataset

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config2_retinanet_r50_infer")
    p.add_argument("--data-root", default="")
    p.add_argument("--ann-file", default="")
    p.add_argument("--split", default="val")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--protocol", choices=["coco", "voc"], default="coco")
    p.add_argument("--max-batches", type=int, default=0)
    args = p.parse_args(argv)

    cfg = config_lib.get_config(args.config)
    module, variables, anchors = build_model(cfg.model)
    if args.checkpoint_dir:
        from shape_based_object_detection_tpu import train as train_lib
        from shape_based_object_detection_tpu.checkpoint import CheckpointManager

        state = train_lib.create_train_state(module, variables, cfg)
        restored = CheckpointManager(args.checkpoint_dir).restore_latest(state)
        if restored is not None:
            variables = {"params": restored.params, **restored.extra_vars}

    detect = make_detect_fn(module, anchors, cfg.model, cfg.data)
    # COCO protocol: crowd GT regions ride along as ignore regions, and the
    # area strata (32^2/96^2 px) are computed in network-input pixels.
    dataset = build_dataset(cfg, args,
                            include_crowd=(args.protocol == "coco"))
    loader = Loader(dataset, cfg.data.batch_size, cfg.data.max_boxes,
                    shuffle=False)
    ev = Evaluator(area_scale=cfg.model.image_size)
    for i, batch in enumerate(loader.batches()):
        det = detect(variables, jnp.asarray(batch.images))
        # detect() labels are 0-based foreground ids; GT labels are 1-based
        ev.add_batch(det, batch.boxes, batch.labels - 1, batch.valid,
                     gt_crowd=batch.crowd)
        if args.max_batches and i + 1 >= args.max_batches:
            break
    metrics = ev.coco() if args.protocol == "coco" else ev.voc()
    metrics.pop("per_class", None)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
