"""Export a trained model to a standalone .sbdx serving artifact.

    python tools/export_model.py --config config2_retinanet_r50_infer \
        [--checkpoint-dir /ckpt] --batch-size 8 --platforms tpu,cpu \
        --out retinanet_r50.sbdx

The artifact embeds the weights and the whole detect() program (StableHLO);
load it with shape_based_object_detection_tpu.export.load_artifact — no model
code, config, or checkpoint needed at serving time.
"""

from __future__ import annotations

import argparse
import sys

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--platforms", default="tpu,cpu")
    p.add_argument("--dtype", default="",
                   help="compute-dtype override baked into the artifact "
                        "(e.g. bfloat16 for the TPU-throughput path)")
    p.add_argument("--quantize", action="store_true",
                   help="embed int8 weight-only quantized constants (~4x "
                        "smaller artifact, dequantize fused on-chip)")
    p.add_argument("--int8-activations", action="store_true",
                   help="with --quantize: bake the dynamic s8xs8->s32 conv "
                        "path into the exported program")
    p.add_argument("--act-scales", default="",
                   help="with --int8-activations: calibrated "
                        "activation-scales JSON (tools/calibrate_scales.py) "
                        "— bakes static scales (the batch-throughput artifact)")
    p.add_argument("--ema", action="store_true",
                   help="export the checkpoint's EMA weights (requires a "
                        "checkpoint trained with ema_decay > 0)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override baked into the artifact (e.g. "
                        "model.detect.tta_hflip=true; JSON-parsed values)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    if args.int8_activations and not args.quantize:
        raise SystemExit("--int8-activations requires --quantize")
    if args.act_scales and not args.int8_activations:
        raise SystemExit("--act-scales requires --int8-activations")

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import export as export_lib
    from shape_based_object_detection_tpu.models.factory import build_model

    cfg = config_lib.resolve_config(args.config, args.overrides)
    if args.dtype:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, dtype=args.dtype))
    module, variables, anchors = build_model(cfg.model)
    if args.checkpoint_dir:
        from shape_based_object_detection_tpu.cli.common import (
            restore_checkpoint_variables,
        )

        # fails loud on a typo'd dir (was: silently exported fresh weights)
        variables = restore_checkpoint_variables(
            cfg, module, variables, args.checkpoint_dir, ema=args.ema)
    elif args.ema:
        raise SystemExit("--ema requires --checkpoint-dir")

    blob = export_lib.export_detect(
        module, variables, anchors, cfg.model, cfg.data,
        batch_size=args.batch_size,
        platforms=tuple(args.platforms.split(",")),
        quantize=args.quantize,
        int8_activations=args.int8_activations,
        activation_scales=args.act_scales or None,
    )
    export_lib.save_artifact(blob, args.out)
    print(f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, "
          f"platforms={args.platforms}, batch={args.batch_size}, "
          f"quantized={args.quantize}")


if __name__ == "__main__":
    main()
