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
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    # persistent XLA cache: warm restarts of the big detection
    # programs load in ~ms instead of recompiling for minutes
    enable_compilation_cache()
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.factory import build_model
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
    p.add_argument("--dataset", default="",
                   help="override the preset's dataset kind (voc|coco|"
                        "synthetic), e.g. to eval a tiny model on real data")
    p.add_argument("--max-batches", type=int, default=0)
    p.add_argument("--per-class", action="store_true",
                   help="include the per-class AP breakdown in the output")
    p.add_argument("--quantize", nargs="?", const="weights", default="",
                   choices=["weights", "full"],
                   help="evaluate the int8 serving path instead of float — "
                        "'weights' (weight-only) or 'full' (+dynamic-int8 "
                        "activations); measures quantization mAP drift")
    p.add_argument("--act-scales", default="",
                   help="with --quantize full: calibrated activation-scales "
                        "JSON (tools/calibrate_scales.py) — evaluates the "
                        "static-scale int8 tier instead of dynamic")
    p.add_argument("--dump-results", default="",
                   help="write detections as standard COCO results JSON "
                        "([{image_id, category_id, bbox xywh px, score}]) — "
                        "cross-checkable with pycocotools elsewhere; "
                        "requires a coco dataset")
    p.add_argument("--ema", action="store_true",
                   help="evaluate the EMA weights from the checkpoint "
                        "(requires a run trained with --ema-decay > 0)")
    p.add_argument("--artifact", default="",
                   help="evaluate an exported .sbdx artifact instead of "
                        "checkpoint params — the export/artifact mAP-parity "
                        "measurement (weights, preprocessing and NMS are "
                        "baked into the program; incompatible with "
                        "--checkpoint-dir/--quantize/--ema/--tta-hflip)")
    p.add_argument("--tta-hflip", action="store_true",
                   help="evaluate with horizontal-flip test-time "
                        "augmentation (fused doubled-batch forward, "
                        "mirror-merged NMS; ~2x forward cost)")
    p.add_argument("--tta-scales", default="",
                   help="evaluate with multi-scale test-time augmentation: "
                        "comma-separated image sizes (e.g. 512,640). Each "
                        "batch uploads once at the base size; non-base "
                        "scales resize on-device before the shared-params "
                        "forward, and a cross-scale class-aware NMS merges. "
                        "Composes with --tta-hflip AND with --quantize "
                        "[--act-scales] (one quantized param tree serves "
                        "every scale). RetinaNet-family configs only (SSD's "
                        "head plan is size-dependent); incompatible with "
                        "--artifact (frozen program)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SECTION.KEY=VALUE",
                   help="config override (JSON-parsed values)")
    args = p.parse_args(argv)

    cfg = config_lib.resolve_config(args.config, args.overrides)
    if args.artifact:
        # the artifact bakes weights + preprocessing + NMS into one frozen
        # program: every knob that would alter that program must be rejected
        # loud (the flags would otherwise silently not apply)
        for flag, name in ((args.checkpoint_dir, "--checkpoint-dir"),
                           (args.quantize, "--quantize"),
                           (args.act_scales, "--act-scales"),
                           (args.ema, "--ema"),
                           (args.tta_hflip, "--tta-hflip"),
                           (args.tta_scales, "--tta-scales")):
            if flag:
                raise SystemExit(f"--artifact is a frozen program: {name} "
                                 "cannot apply (bake it at export time via "
                                 "tools/export_model.py)")
    if args.tta_hflip:
        from shape_based_object_detection_tpu.cli.common import (
            enable_tta_hflip,
        )

        cfg = enable_tta_hflip(cfg)
    if args.dataset:
        import dataclasses

        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, dataset=args.dataset))
    if args.artifact:
        import dataclasses

        from shape_based_object_detection_tpu.export import load_artifact

        model = load_artifact(args.artifact)
        hdr = model.header
        # the eval geometry must match the baked program exactly — a silent
        # mismatch would score resized-wrong pixels
        for key, got in (("image_size", cfg.model.image_size),
                         ("num_classes", cfg.model.num_classes),
                         ("letterbox", cfg.data.letterbox)):
            if hdr.get(key, got) != got:
                raise SystemExit(
                    f"artifact/config mismatch: header {key}="
                    f"{hdr.get(key)!r} but --config resolves to {got!r}")
        # the artifact has ONE compiled batch shape; batches_padded() pads
        # the ragged tail to it
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data,
                                          batch_size=hdr["batch_size"]))
        variables = None

        def detect(_, images):
            return model(images)
    else:
        module, variables, anchors = build_model(cfg.model)
        if args.checkpoint_dir:
            from shape_based_object_detection_tpu.cli.common import (
                restore_checkpoint_variables,
            )

            variables = restore_checkpoint_variables(
                cfg, module, variables, args.checkpoint_dir, ema=args.ema)
        elif args.ema:
            raise SystemExit("--ema requires --checkpoint-dir")
        if args.act_scales and args.quantize != "full":
            raise SystemExit("--act-scales requires --quantize full")

        if args.tta_scales:
            from shape_based_object_detection_tpu.detection import (
                MultiScaleBatchDetector,
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
            try:
                # --quantize composes: the throughput tier (static int8) and
                # the accuracy tier (multi-scale TTA) are one deployment
                detect = MultiScaleBatchDetector(
                    cfg.model, variables, scales, cfg.data,
                    quantize=args.quantize,
                    activation_scales=args.act_scales or None)
            except ValueError as e:  # e.g. SSD at a foreign scale
                raise SystemExit(str(e))
            variables = detect.serving_variables
        else:
            from shape_based_object_detection_tpu.quantize import (
                make_serving_detect,
            )

            detect, variables = make_serving_detect(
                module, anchors, cfg.model, cfg.data, variables,
                args.quantize, activation_scales=args.act_scales or None)
    # COCO protocol: crowd GT regions ride along as ignore regions, and the
    # area strata (32^2/96^2 px) follow pycocotools — ORIGINAL-image
    # annotation pixels, via per-image area factors when the dataset knows
    # its original sizes (COCO does); otherwise the uniform
    # network-input-pixel fallback applies.
    dataset = build_dataset(cfg, args, include_ignore=True)
    loader = Loader(dataset, cfg.data.batch_size, cfg.data.max_boxes,
                    shuffle=False)

    # Distributed eval: when several devices are visible and the batch
    # divides evenly, shard eval batches over the 'data' axis — linear eval
    # speedup on a pod slice, a no-op on one chip.
    import jax

    data_shard = None
    # single-process only: multi-process, a device_put of host-local data
    # against a global sharding would reinterpret each host's batch as the
    # whole global batch (train_cli's run_eval owns the multi-host path)
    if (not args.artifact and not args.tta_scales
            and jax.process_count() == 1
            and jax.device_count() > 1
            and cfg.data.batch_size % jax.device_count() == 0):
        from shape_based_object_detection_tpu.parallel import (
            batch_sharding, replicated_sharding,
        )
        from shape_based_object_detection_tpu.parallel.mesh import (
            make_mesh_for_batch,
        )

        mesh = make_mesh_for_batch(cfg.data.batch_size, cfg=cfg.mesh)
        data_shard = batch_sharding(mesh, cfg.mesh)
        variables = jax.device_put(variables, replicated_sharding(mesh))
    coco_results = []
    is_coco_ds = hasattr(dataset, "coco")
    ev = Evaluator(area_scale=1.0 if is_coco_ds else cfg.model.image_size)

    def batch_area_factors(start: int, count: int):
        # loader is unshuffled: batch rows map to dataset rows
        # [start, start + count)
        if not is_coco_ds:
            return None
        out = np.empty((count,), np.float64)
        for b in range(count):
            im = dataset.images[start + b]
            w, h = float(im["width"]), float(im["height"])
            out[b] = max(w, h) ** 2 if cfg.data.letterbox else w * h
        return out

    import types

    sample_idx = 0
    # batches_padded covers the ragged tail (batches() would silently skip
    # up to batch_size-1 images, skewing mAP and truncating --dump-results);
    # padded rows are dropped below via n_valid
    for i, (batch, n_valid) in enumerate(loader.batches_padded()):
        if data_shard is not None:
            # one host->mesh transfer (jnp.asarray first would commit to the
            # default device and pay a second device-to-device reshard)
            images = jax.device_put(batch.images, data_shard)
        else:
            images = jnp.asarray(batch.images)
        det = detect(variables, images)
        det_np = types.SimpleNamespace(
            boxes=np.asarray(det.boxes)[:n_valid],
            scores=np.asarray(det.scores)[:n_valid],
            labels=np.asarray(det.labels)[:n_valid],
            valid=np.asarray(det.valid)[:n_valid])
        # detect() labels are 0-based foreground ids; GT labels are 1-based.
        # The flag channel is COCO crowd (crowd-IoU ignore) or VOC difficult
        # (plain-IoU ignore, the official VOC protocol) by dataset kind.
        flag_kw = "gt_crowd" if is_coco_ds else "gt_ignore"
        ev.add_batch(det_np, batch.boxes[:n_valid], batch.labels[:n_valid] - 1,
                     batch.valid[:n_valid],
                     area_factors=batch_area_factors(sample_idx, n_valid),
                     **{flag_kw: batch.crowd[:n_valid]})
        if args.dump_results and is_coco_ds:
            # recover original image ids/sizes for the same dataset rows
            from shape_based_object_detection_tpu.utils.image import (
                boxes_norm_to_original_px,
            )

            for b in range(n_valid):
                im = dataset.images[sample_idx + b]
                v = np.asarray(det.valid[b])
                boxes_px = boxes_norm_to_original_px(
                    np.asarray(det.boxes[b])[v], im["height"], im["width"],
                    letterbox=cfg.data.letterbox)
                for box, score, label in zip(
                        boxes_px, np.asarray(det.scores[b])[v],
                        np.asarray(det.labels[b])[v]):
                    x0, y0, x1, y1 = [float(t) for t in box]
                    coco_results.append({
                        "image_id": int(im["id"]),
                        "category_id": int(
                            dataset.coco.label_to_cat_id[int(label) + 1]),
                        "bbox": [round(x0, 2), round(y0, 2),
                                 round(x1 - x0, 2), round(y1 - y0, 2)],
                        "score": round(float(score), 5),
                    })
        sample_idx += n_valid
        if args.max_batches and i + 1 >= args.max_batches:
            break
    if args.dump_results:
        with open(args.dump_results, "w") as f:
            json.dump(coco_results, f)
        print(f"wrote {len(coco_results)} results to {args.dump_results}",
              flush=True)
    metrics = ev.coco() if args.protocol == "coco" else ev.voc()
    if not args.per_class:
        metrics.pop("per_class", None)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
