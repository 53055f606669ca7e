"""``sbd-serve``: HTTP detection serving (server.py) over a checkpoint or an
exported ``.sbdx`` artifact, with dynamic batching into the compiled batch.

    sbd-serve --config config2_retinanet_r50_infer --checkpoint-dir /ckpt \
        --quantize full --act-scales scales.json --batch-size 16 --port 8000
    curl -s -X POST --data-binary @img.jpg \
        'localhost:8000/detect?min_score=0.3'
"""

from __future__ import annotations

import argparse

from shape_based_object_detection_tpu.utils.platform import (
    honor_jax_platforms_env,
)


def main(argv=None):
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    # persistent XLA cache: warm restarts of the big detection
    # programs load in ~ms instead of recompiling for minutes
    enable_compilation_cache()
    honor_jax_platforms_env()

    p = argparse.ArgumentParser()
    p.add_argument("--config", default="config2_retinanet_r50_infer")
    p.add_argument("--checkpoint-dir", default="")
    p.add_argument("--artifact", default="",
                   help="serve an exported .sbdx instead of building the "
                        "model (export.py)")
    p.add_argument("--ema", action="store_true")
    p.add_argument("--quantize", nargs="?", const="weights", default="",
                   choices=["weights", "full"])
    p.add_argument("--act-scales", default="",
                   help="with --quantize full: calibrated scales JSON "
                        "(tools/calibrate_scales.py)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--bucket-sizes", default="auto",
                   help="comma-separated batch buckets (small requests pad "
                        "only to the smallest fitting bucket — less H2D + "
                        "compute at low load); 'auto' = powers of 2 up to "
                        "--batch-size; 'none' = single fixed batch")
    p.add_argument("--batch-window-ms", type=float, default=5.0,
                   help="how long the first request of a batch waits for "
                        "co-riders before dispatching")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--class-names", default="",
                   help="optional text file, one class name per line "
                        "(0-based label order); 'voc' = the builtin VOC set")
    p.add_argument("--verbose", action="store_true",
                   help="log one line per request")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE")
    args = p.parse_args(argv)

    names = None
    if args.class_names == "voc":
        from shape_based_object_detection_tpu.data.voc import VOC_CLASSES

        names = list(VOC_CLASSES)
    elif args.class_names:
        with open(args.class_names) as f:
            names = [ln.strip() for ln in f if ln.strip()]

    if args.artifact:
        if args.quantize or args.act_scales:
            raise SystemExit("--quantize/--act-scales cannot modify an "
                             "exported --artifact (bake them at export "
                             "time: tools/export_model.py)")
        from shape_based_object_detection_tpu.serving import (
            ArtifactPredictor,
        )

        pred = ArtifactPredictor(args.artifact)
    else:
        from shape_based_object_detection_tpu import config as config_lib
        from shape_based_object_detection_tpu.models.factory import (
            build_model,
        )
        from shape_based_object_detection_tpu.serving import Predictor

        cfg = config_lib.resolve_config(args.config, args.overrides)
        variables = None
        if args.checkpoint_dir:
            from shape_based_object_detection_tpu.cli.common import (
                restore_checkpoint_variables,
            )

            module, variables0, _ = build_model(cfg.model)
            variables = restore_checkpoint_variables(
                cfg, module, variables0, args.checkpoint_dir, ema=args.ema)
        elif args.ema:
            raise SystemExit("--ema requires --checkpoint-dir")
        from shape_based_object_detection_tpu.serving import (
            default_bucket_sizes,
        )

        if args.bucket_sizes == "auto":
            buckets = default_bucket_sizes(args.batch_size)
        elif args.bucket_sizes in ("none", ""):
            buckets = None
        else:
            buckets = [int(b) for b in args.bucket_sizes.split(",")]
        pred = Predictor(cfg, variables=variables,
                         batch_size=args.batch_size,
                         quantize=args.quantize,
                         activation_scales=args.act_scales or None,
                         bucket_sizes=buckets)

    from shape_based_object_detection_tpu.server import DetectionServer

    print("compiling (one program per batch bucket)...", flush=True)
    pred.warmup()
    server = DetectionServer(pred, host=args.host, port=args.port,
                             batch_window_ms=args.batch_window_ms,
                             class_names=names)
    server.verbose = args.verbose
    buckets_msg = getattr(pred, "bucket_sizes", None) or [pred.batch_size]
    print(f"serving on http://{args.host}:{server.port}/detect "
          f"(batch buckets={buckets_msg}, window={args.batch_window_ms}ms); "
          "GET /healthz for readiness", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.close()


if __name__ == "__main__":
    main()
