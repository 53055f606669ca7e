"""Inference entry point (the reference's ``detect.py`` analog, SURVEY.md §3.2).

    python -m shape_based_object_detection_tpu.cli.detect_cli \
        --config config1_ssd300_infer --image photo.jpg --checkpoint-dir /ckpt
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.detection import (
        make_detect_fn, detect_single_image,
    )
    from shape_based_object_detection_tpu.utils.image import decode_image_host

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config1_ssd300_infer")
    p.add_argument("--image", required=True)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--min-score", type=float, default=0.3)
    p.add_argument("--quantize", action="store_true",
                   help="serve from int8 weight-only quantized params")
    p.add_argument("--ema", action="store_true",
                   help="serve the checkpoint's EMA weights (needs a "
                        "checkpoint trained with ema_decay > 0)")
    p.add_argument("--artifact", default="",
                   help="run from an exported .sbdx artifact instead of "
                        "building the model (--config/--checkpoint ignored)")
    args = p.parse_args(argv)

    img = decode_image_host(args.image)

    if args.artifact:
        from shape_based_object_detection_tpu.serving import ArtifactPredictor

        det = ArtifactPredictor(args.artifact).predict([img])[0]
        boxes, scores, labels = det.boxes, det.scores, det.labels
    else:
        import dataclasses

        cfg = config_lib.get_config(args.config)
        module, variables, anchors = build_model(cfg.model)

        if args.checkpoint_dir:
            from shape_based_object_detection_tpu import train as train_lib
            from shape_based_object_detection_tpu.checkpoint import (
                CheckpointManager,
            )

            if args.ema and cfg.train.ema_decay == 0:
                # restore template must carry the EMA subtree to match a
                # checkpoint trained with --ema-decay
                cfg = dataclasses.replace(
                    cfg, train=dataclasses.replace(cfg.train, ema_decay=0.99))
            state = train_lib.create_train_state(module, variables, cfg)
            restored = CheckpointManager(
                args.checkpoint_dir).restore_latest(state)
            if restored is not None:
                if args.ema and restored.ema_params is None:
                    raise SystemExit(
                        "--ema: checkpoint has no EMA weights (train with "
                        "--ema-decay > 0)")
                params = (restored.ema_params if args.ema
                          else restored.params)
                variables = {"params": params, **restored.extra_vars}

        if args.quantize:
            from shape_based_object_detection_tpu.quantize import (
                make_quantized_detect_fn, quantize_params,
            )

            variables = quantize_params(variables)
            detect = make_quantized_detect_fn(module, anchors, cfg.model,
                                              cfg.data)
        else:
            detect = make_detect_fn(module, anchors, cfg.model, cfg.data)
        boxes, scores, labels = detect_single_image(
            detect, variables, img, cfg.model.image_size,
            letterbox=cfg.data.letterbox,
        )
    # detect() labels are 0-based foreground ids; report dataset 1-based ids
    # (VOC_CLASSES / the COCO contiguous mapping) like the reference does
    results = [
        {"box": [round(float(v), 2) for v in b], "score": round(float(s), 4),
         "label": int(l) + 1}
        for b, s, l in zip(boxes, scores, labels)
        if s >= args.min_score
    ]
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
