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
    img = decode_image_host(args.image)
    boxes, scores, labels = detect_single_image(
        detect, variables, img, cfg.model.image_size
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
