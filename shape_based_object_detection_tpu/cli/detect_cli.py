"""Inference entry point (the reference's ``detect.py`` analog, SURVEY.md §3.2).

    python -m shape_based_object_detection_tpu.cli.detect_cli \
        --config config1_ssd300_infer --image photo.jpg --checkpoint-dir /ckpt
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    # persistent XLA cache: warm restarts of the big detection
    # programs load in ~ms instead of recompiling for minutes
    enable_compilation_cache()
    from shape_based_object_detection_tpu.utils.image import decode_image_host

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config1_ssd300_infer")
    p.add_argument("--image", required=True,
                   help="an image file OR a directory of images (jpg/png); "
                        "directories produce one result entry per file")
    p.add_argument("--save-viz", default="",
                   help="directory to write copies of the input images with "
                        "detection boxes drawn (utils/viz.py)")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--min-score", type=float, default=0.3)
    p.add_argument("--quantize", action="store_true",
                   help="serve from int8 weight-only quantized params")
    p.add_argument("--act-scales", default="",
                   help="with --int8-activations: calibrated "
                        "activation-scales JSON (tools/calibrate_scales.py) "
                        "for the static-scale int8 latency tier")
    p.add_argument("--int8-activations", action="store_true",
                   help="with --quantize: run eligible convs as s8xs8->s32 "
                        "on the MXU (dynamic activation scales)")
    p.add_argument("--ema", action="store_true",
                   help="serve the checkpoint's EMA weights (needs a "
                        "checkpoint trained with ema_decay > 0)")
    p.add_argument("--tta-hflip", action="store_true",
                   help="horizontal-flip test-time augmentation: fused "
                        "doubled-batch forward, mirror-merged NMS "
                        "(~2x forward cost; shortcut for "
                        "--set model.detect.tta_hflip=true)")
    p.add_argument("--tta-scales", default="",
                   help="comma-separated image sizes for multi-scale "
                        "test-time augmentation (e.g. 512,640): one "
                        "compiled program per scale, shared params, "
                        "cross-scale NMS merge; composes with --tta-hflip")
    p.add_argument("--artifact", default="",
                   help="run from an exported .sbdx artifact instead of "
                        "building the model (--config/--checkpoint ignored)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override (JSON-parsed values)")
    args = p.parse_args(argv)

    import os

    if args.tta_scales and args.artifact:
        raise SystemExit(
            "--tta-scales cannot modify an exported --artifact (its program "
            "is frozen at one scale); export per-scale artifacts or drop "
            "--artifact")
    if args.artifact and args.tta_hflip:
        # same frozen-program rule as the quantize flags below: export with
        # model.detect.tta_hflip=true to bake TTA into the artifact
        raise SystemExit(
            "--tta-hflip cannot modify an exported --artifact; export with "
            "tools/export_model.py --set model.detect.tta_hflip=true instead")
    if args.artifact and (args.quantize or args.int8_activations
                          or args.act_scales):
        # an artifact's program is frozen at export; silently running the
        # float artifact would make an int8-vs-float comparison measure
        # nothing — tools/export_model.py bakes the quantization mode in
        raise SystemExit(
            "--quantize/--int8-activations/--act-scales cannot modify an "
            "exported --artifact; export with tools/export_model.py "
            "--quantize [--int8-activations] [--act-scales] instead")

    is_dir = os.path.isdir(args.image)
    if is_dir:
        exts = (".jpg", ".jpeg", ".png", ".bmp")
        paths = sorted(
            os.path.join(args.image, f) for f in os.listdir(args.image)
            if f.lower().endswith(exts))
        if not paths:
            raise SystemExit(f"no images found in {args.image}")
    else:
        paths = [args.image]

    run_one = _build_runner(args)
    all_results = {}
    for path in paths:
        img = decode_image_host(path)
        boxes, scores, labels = run_one(img)
        results = [
            {"box": [round(float(v), 2) for v in b],
             "score": round(float(s), 4), "label": int(l) + 1}
            for b, s, l in zip(boxes, scores, labels)
            if s >= args.min_score
        ]
        all_results[os.path.basename(path)] = results
        if args.save_viz:
            import numpy as np

            from shape_based_object_detection_tpu.utils.viz import (
                draw_detections,
            )

            os.makedirs(args.save_viz, exist_ok=True)
            drawn = draw_detections(
                img, np.asarray(boxes), np.asarray(scores),
                np.asarray(labels), min_score=args.min_score)
            from PIL import Image

            out_path = os.path.join(
                args.save_viz,
                os.path.splitext(os.path.basename(path))[0] + "_det.png")
            Image.fromarray(drawn).save(out_path)
    # single-FILE invocations keep the original flat-list output contract;
    # directory mode always emits the {filename: [dets]} mapping, even for a
    # directory that happens to contain one image (a schema keyed on the
    # image COUNT would make consumers' parsing depend on directory content)
    print(json.dumps(all_results if is_dir
                     else all_results[os.path.basename(paths[0])], indent=2))


def _build_runner(args):
    """Returns run(img_u8) -> (boxes_px, scores, labels); the underlying
    jitted program compiles once and is reused across a directory."""
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.detection import detect_single_image

    if args.artifact:
        from shape_based_object_detection_tpu.serving import ArtifactPredictor

        predictor = ArtifactPredictor(args.artifact)

        def run(img):
            det = predictor.predict([img])[0]
            return det.boxes, det.scores, det.labels

        return run
    else:
        cfg = config_lib.resolve_config(args.config, args.overrides)
        if args.tta_hflip:
            from shape_based_object_detection_tpu.cli.common import (
                enable_tta_hflip,
            )

            cfg = enable_tta_hflip(cfg)
        module, variables, anchors = build_model(cfg.model)

        if args.checkpoint_dir:
            from shape_based_object_detection_tpu.cli.common import (
                restore_checkpoint_variables,
            )

            variables = restore_checkpoint_variables(
                cfg, module, variables, args.checkpoint_dir, ema=args.ema)

        if args.int8_activations and not args.quantize:
            raise SystemExit("--int8-activations requires --quantize")
        if args.act_scales and not args.int8_activations:
            raise SystemExit("--act-scales requires --int8-activations")
        mode = ("full" if args.int8_activations else
                "weights" if args.quantize else "")

        if args.tta_scales:
            from shape_based_object_detection_tpu.detection import (
                MultiScaleDetector,
            )

            try:
                scales = [int(s) for s in args.tta_scales.split(",")
                          if s.strip()]
            except ValueError:
                raise SystemExit(
                    f"--tta-scales must be comma-separated integers "
                    f"(e.g. 512,640), got {args.tta_scales!r}")
            if not scales:
                raise SystemExit("--tta-scales named no scales")
            # MultiScaleDetector is itself run(img) -> (boxes, scores,
            # labels); composes with --tta-hflip via cfg.model.detect and
            # with the int8 flags (one quantized tree serves every scale)
            return MultiScaleDetector(cfg.model, variables, scales,
                                      cfg.data,
                                      letterbox=cfg.data.letterbox,
                                      quantize=mode,
                                      activation_scales=args.act_scales
                                      or None)

        from shape_based_object_detection_tpu.quantize import (
            make_serving_detect,
        )
        detect, variables = make_serving_detect(
            module, anchors, cfg.model, cfg.data, variables, mode,
            activation_scales=args.act_scales or None)

        def run(img):
            # detect() labels are 0-based foreground ids; main() reports
            # dataset 1-based ids (VOC_CLASSES / the COCO contiguous
            # mapping) like the reference does
            return detect_single_image(
                detect, variables, img, cfg.model.image_size,
                letterbox=cfg.data.letterbox,
            )

        return run


if __name__ == "__main__":
    main()
