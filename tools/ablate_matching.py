"""End-to-end ablation of shape-similarity matching (component C13 — the
research contribution): train the SAME model twice, once with plain-IoU
matching (shape_weight=0) and once with the shape-aware quality, on a
synthetic dataset with a heavy tail of thin/elongated objects, and report
held-out COCO-protocol mAP for both arms.

BASELINE.md's "reference shape-matching mAP delta" row is unverifiable (the
reference mount is empty — SURVEY.md §0) and no real COCO/VOC data is in
this environment, so this measures the framework's OWN shape-matching effect
under controlled conditions: identical init (same PRNGKey), identical data
order, identical schedule — only MatchConfig differs. The extreme-aspect
regime is where the two matchers disagree (tools/matching_analysis.py shows
the static matching statistics; this shows the end-task effect).

    python tools/ablate_matching.py                      # tiny retinanet, CPU-ok
    JAX_PLATFORMS=cpu python tools/ablate_matching.py --steps 400
    python tools/ablate_matching.py --family ssd --shape-weight 0.3
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

import numpy as np


def _make_cfg(args, shape_weight: float):
    from shape_based_object_detection_tpu import config as config_lib

    if args.model_preset:
        model_cfg = config_lib.get_config(args.model_preset).model
        family = model_cfg.family
    else:
        model_cfg = config_lib.tiny_test_model(args.family)
        family = args.family
    if args.num_classes:
        # resolving power needs per-class data density: 80-class presets on
        # an N-image synthetic split leave N/80 images per class and the
        # arms' absolute mAP floors at ~0 (measured 2026-08-20, 3000-step
        # 80-class run: both arms < 0.002 mAP). 20 classes matches the
        # capstone benchmark's density.
        model_cfg = dataclasses.replace(model_cfg,
                                        num_classes=args.num_classes)
    args.family = family  # loss kind + report label follow the real family
    # open up the detector for small/thin objects: the default tiny preset
    # keeps the real models' score threshold, fine here too
    warmup = max(20, args.steps // 20)
    decay = max(2 * args.steps // 3, warmup + 1)
    return config_lib.ExperimentConfig(
        model=model_cfg,
        data=dataclasses.replace(
            config_lib.DataConfig(dataset="synthetic",
                                  batch_size=args.batch,
                                  max_boxes=args.max_objects),
            photometric=False, expand=False, random_crop=False, hflip=True,
        ),
        train=dataclasses.replace(
            config_lib.TrainConfig(), base_lr=args.lr, warmup_steps=warmup,
            weight_decay=0.0, total_steps=args.steps,
            lr_decay_steps=(decay,),
        ),
        match=config_lib.MatchConfig(
            pos_threshold=0.5, neg_threshold=0.4,
            shape_weight=shape_weight, shape_tau=args.tau,
            force_match_for_each_gt=True,
        ),
        loss=config_lib.LossConfig(
            kind="multibox" if args.family == "ssd" else "focal"),
    )


def run_arm(args, shape_weight: float, seed: int = 7) -> dict:
    import jax

    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
    from shape_based_object_detection_tpu.eval.ap import Evaluator
    from shape_based_object_detection_tpu.models.factory import build_model

    cfg = _make_cfg(args, shape_weight)
    size = cfg.model.image_size

    train_ds = SyntheticDetection(
        size=size, num_images=args.train_images,
        max_objects=args.max_objects, num_classes=cfg.model.num_classes,
        seed=1, aspect_std=args.aspect_std, class_aspect=args.class_aspect)
    val_ds = SyntheticDetection(
        size=size, num_images=args.val_images,
        max_objects=args.max_objects, num_classes=cfg.model.num_classes,
        seed=2, aspect_std=args.aspect_std,
        class_aspect=args.class_aspect)  # disjoint generator stream

    # identical init across arms AT EACH SEED: the seed drives model init,
    # augmentation rng and data order together, so the two arms of one seed
    # differ ONLY in MatchConfig, and seeds are independent replicates.
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, seed=seed))
    module, variables, anchors = build_model(cfg.model,
                                             rng=jax.random.PRNGKey(seed))
    state = train_lib.create_train_state(module, variables, cfg)
    step_fn = train_lib.make_train_step(module, anchors, cfg, augment=True)

    if args.loader == "device":
        # Full-size arms on a remotely-tunneled chip are H2D-bound through
        # the plain Loader (an SSD-300 b8 f32 batch is 8.6 MB at ~10 MB/s);
        # stage the whole synthetic split in HBM once and gather batches
        # on-device, exactly like train_cli --loader device. The tag names
        # the cache per flag combination for readability; correctness on a
        # stale dir is guaranteed by build_cache's source fingerprint check.
        from shape_based_object_detection_tpu.data.cache import (
            DeviceCacheLoader, MemmapDetection, build_cache,
        )

        tag = (f"{size}_{args.train_images}x{args.val_images}"
               f"_a{args.aspect_std:g}_g{args.max_objects}"
               f"_c{cfg.model.num_classes}"
               + (f"_ca{args.class_aspect:g}" if args.class_aspect else ""))
        train_dir = build_cache(
            train_ds, os.path.join(args.cache_dir, f"train_{tag}"),
            cfg.data.max_boxes, workers=1)
        loader = DeviceCacheLoader(
            MemmapDetection(train_dir), cfg.data.batch_size,
            cfg.data.max_boxes, seed=seed, shuffle=True)
        train_batches = loader.device_batches
        val_dir = build_cache(
            val_ds, os.path.join(args.cache_dir, f"val_{tag}"),
            cfg.data.max_boxes, workers=1)
        val_loader = DeviceCacheLoader(
            MemmapDetection(val_dir), cfg.data.batch_size,
            cfg.data.max_boxes, shuffle=False)
    else:
        loader = Loader(train_ds, cfg.data.batch_size, cfg.data.max_boxes,
                        seed=seed, shuffle=True)
        train_batches = loader.batches
        val_loader = Loader(val_ds, cfg.data.batch_size, cfg.data.max_boxes,
                            shuffle=False)
    t0 = time.time()
    step, epoch, last_loss = 0, 0, float("nan")
    while step < args.steps:
        for batch in train_batches(epoch):
            state, metrics = step_fn(state, batch._asdict())
            step += 1
            if step % max(args.steps // 10, 1) == 0:
                last_loss = float(metrics["loss"])
                print(f"  [w={shape_weight:g}] step {step}/{args.steps} "
                      f"loss={last_loss:.4f}", flush=True)
            if step >= args.steps:
                break
        epoch += 1
    train_s = time.time() - t0

    eval_step = train_lib.make_eval_step(module, anchors, cfg)
    evaluator = Evaluator(area_scale=size)
    for batch, n_valid in val_loader.batches_padded():
        det = eval_step(state, batch.images)
        det = jax.tree_util.tree_map(lambda x: np.asarray(x)[:n_valid], det)
        # GT labels are 1-based (0 = background) everywhere in the data
        # layer; detection labels are 0-based class ids — shift like
        # eval_cli/train_cli do. (Rounds 1–3 of this tool lacked the -1, so
        # every arm scored ~0 mAP against off-by-one classes and the
        # recorded "null" deltas measured nothing.)
        evaluator.add_batch(det, batch.boxes[:n_valid],
                            batch.labels[:n_valid] - 1,
                            batch.valid[:n_valid])
    m = evaluator.coco()

    def _f(v):  # strata with no GT are NaN; emit strict JSON
        return None if not np.isfinite(v) else float(v)

    return {
        "shape_weight": shape_weight,
        "seed": seed,
        "class_aspect": args.class_aspect,
        "mAP": _f(m["mAP"]), "AP50": _f(m["AP50"]), "AP75": _f(m["AP75"]),
        "APsmall": _f(m["APsmall"]), "APmedium": _f(m["APmedium"]),
        "APlarge": _f(m["APlarge"]),
        "final_loss": last_loss,
        "train_s": round(train_s, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--family", choices=["retinanet", "ssd"],
                   default="retinanet")
    p.add_argument("--model-preset", default=None,
                   help="full-size model preset (e.g. ssd300, "
                        "retinanet_r50_fpn) instead of --family's tiny "
                        "model — the at-scale version of the ablation")
    p.add_argument("--steps", type=int, default=600)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--lr", type=float, default=0.01)
    p.add_argument("--shape-weight", type=float, default=0.3,
                   help="shape_weight of the shape-aware arm (config #3 value)")
    p.add_argument("--tau", type=float, default=1.0)
    p.add_argument("--class-aspect", type=float, default=0.0,
                   help="per-CLASS characteristic log-aspect spread "
                        "(synthetic.py class_aspect): the benchmark variant "
                        "engineered to FAVOR shape priors — object shape "
                        "carries class identity")
    p.add_argument("--aspect-std", type=float, default=1.2,
                   help="log-aspect stddev of the synthetic objects "
                        "(1.2 => ~22%% of boxes beyond 4.5:1)")
    p.add_argument("--train-images", type=int, default=512)
    p.add_argument("--val-images", type=int, default=128)
    p.add_argument("--max-objects", type=int, default=4)
    p.add_argument("--num-classes", type=int, default=0,
                   help="override the preset's class count (0 = keep); "
                        "full-size presets are 80-class COCO shapes — use "
                        "20 to match the capstone benchmark's per-class "
                        "data density")
    p.add_argument("--loader", choices=["threads", "device"],
                   default="threads",
                   help="device = stage the synthetic splits in device HBM "
                        "once and gather batches on-device (use for "
                        "--model-preset runs on a transfer-bound host; "
                        "same batch membership/schedule, still paired "
                        "per seed across arms)")
    p.add_argument("--cache-dir", default="/tmp/ablate_matching_cache",
                   help="--loader device memmap cache location")
    p.add_argument("--seeds", type=int, default=3,
                   help="independent replicates per arm (seeds 7..7+N-1); "
                        "the reported delta is the PAIRED per-seed mean±std "
                        "— single-seed deltas at tiny scale are noise")
    p.add_argument("--arms-file", default="",
                   help="JSONL path: append each finished arm's result and, "
                        "on restart, skip (seed, shape_weight) arms already "
                        "recorded — a multi-hour run survives a tunnel "
                        "flake at the cost of one arm instead of all of "
                        "them (a 10-arm run wedged at arm 10 on "
                        "2026-08-20 and lost 9 in-memory results)")
    args = p.parse_args(argv)

    done: dict[tuple[int, float], dict] = {}
    if args.arms_file and os.path.exists(args.arms_file):
        with open(args.arms_file) as f:
            for line in f:
                if line.strip():
                    r = json.loads(line)
                    if r.get("class_aspect", 0.0) != args.class_aspect:
                        continue  # arm from a different benchmark variant
                    done[(r["seed"], r["shape_weight"])] = r
        if done:
            print(f"resuming: {len(done)} arm(s) loaded from "
                  f"{args.arms_file}", flush=True)

    seeds = list(range(7, 7 + args.seeds))
    results = []
    for seed in seeds:
        for w in (0.0, args.shape_weight):
            if (seed, w) in done:
                print(f"--- seed {seed}, shape_weight {w:g} --- (cached)",
                      flush=True)
                results.append(done[(seed, w)])
                continue
            print(f"--- seed {seed}, shape_weight {w:g} ---", flush=True)
            r = run_arm(args, w, seed=seed)
            results.append(r)
            if args.arms_file:
                with open(args.arms_file, "a") as f:
                    f.write(json.dumps(r) + "\n")

    print(f"\n{'seed':>5} {'shape_w':>8} {'mAP':>7} {'AP50':>7} {'AP75':>7} "
          f"{'APsmall':>8} {'APmed':>7} {'APlarge':>8}")
    for r in results:
        row = [r[k] for k in ("mAP", "AP50", "AP75", "APsmall", "APmedium",
                              "APlarge")]
        cells = " ".join(f"{v:>7.4f}" if v is not None else f"{'—':>7}"
                         for v in row)
        print(f"{r['seed']:>5} {r['shape_weight']:>8g} {cells}")

    iou_maps = np.asarray([r["mAP"] for r in results
                           if r["shape_weight"] == 0.0])
    shape_maps = np.asarray([r["mAP"] for r in results
                             if r["shape_weight"] != 0.0])
    deltas = shape_maps - iou_maps  # paired per seed (same order)
    if max(iou_maps.mean(), shape_maps.mean()) < 0.05:
        print("WARNING: both arms' absolute mAP < 0.05 — the benchmark has "
              "no resolving power at this scale/step count (or the harness "
              "is broken); the delta below measures noise, not the matcher.",
              file=sys.stderr)
    print(json.dumps({
        "metric": "shape_matching_map_delta_synthetic",
        "value": round(float(deltas.mean()), 4),
        "std": round(float(deltas.std(ddof=1)), 4) if len(deltas) > 1 else None,
        "unit": "mAP",
        "iou_mAP_mean": round(float(iou_maps.mean()), 4),
        "iou_mAP_std": round(float(iou_maps.std(ddof=1)), 4)
        if len(iou_maps) > 1 else None,
        "shape_mAP_mean": round(float(shape_maps.mean()), 4),
        "shape_mAP_std": round(float(shape_maps.std(ddof=1)), 4)
        if len(shape_maps) > 1 else None,
        "seeds": seeds,
        "arms": results,
        "note": (f"{args.model_preset or ('tiny ' + args.family)}, "
                 f"{args.steps} steps, aspect_std="
                 f"{args.aspect_std}, loader={args.loader} (device sorts "
                 "indices within a batch, so per-sample augment RNG differs "
                 "from threads runs — deltas are paired within one run, "
                 "never across loader modes); arms paired per seed "
                 "(identical init/data within a seed); COCO-protocol mAP "
                 "on held-out synthetic val"),
    }))


if __name__ == "__main__":
    main()
