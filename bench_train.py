"""Training-throughput benchmark (secondary; the driver headline is bench.py).

Measures the full donated train_step — on-device augmentation -> forward ->
matching -> loss -> grad -> SGD update — for RetinaNet R50-FPN at 512px in
bfloat16 on the available chip. Prints one JSON line.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np

BATCH = 16
SIZE = 512


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--augment-dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="compute dtype of the fused augmentation stage "
                         "(DataConfig.augment_dtype)")
    ap.add_argument("--momentum-dtype", default="",
                    choices=["", "float32", "bfloat16"],
                    help="SGD momentum accumulator dtype "
                         "(TrainConfig.momentum_dtype; bfloat16 halves the "
                         "optimizer state's HBM traffic per step)")
    ap.add_argument("--pipelined", action="store_true",
                    help="measure make_train_step_pipelined (augment of "
                         "batch i+1 folded into step i's program)")
    ap.add_argument("--config5", action="store_true",
                    help="measure the config #5 per-chip slice instead: "
                         "RetinaNet R101-FPN at 1024px (196k anchors), "
                         "remat on (use with --batch 4)")
    args = ap.parse_args()
    batch_size = args.batch
    import jax
    import jax.numpy as jnp

    from shape_based_object_detection_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.models.factory import build_model

    cfg = config_lib.get_config("config4_retinanet_r101_coco_train")
    if args.config5:
        base = config_lib.get_config("config5_multihost_dp_train")
        model_cfg = dataclasses.replace(base.model, dtype="bfloat16")
        args.remat = True
    else:
        model_cfg = dataclasses.replace(
            config_lib.RETINANET_R50_512, dtype="bfloat16")
    if args.remat:
        # segment-wise model remat (ModelConfig.remat) — the effective lever
        model_cfg = dataclasses.replace(model_cfg, remat=True)
    cfg = dataclasses.replace(
        cfg,
        model=model_cfg,
        data=dataclasses.replace(cfg.data, batch_size=batch_size,
                                 max_boxes=64,
                                 augment_dtype=args.augment_dtype),
        train=dataclasses.replace(cfg.train, remat=args.remat,
                                  momentum_dtype=args.momentum_dtype),
    )
    module, variables, anchors = build_model(model_cfg)
    state = train_lib.create_train_state(module, variables, cfg)
    step = train_lib.make_train_step(module, anchors, cfg,
                                     augment=not args.no_augment)

    rng = np.random.default_rng(0)
    g = cfg.data.max_boxes
    size = model_cfg.image_size
    batch = {
        "images": jnp.asarray(
            rng.integers(0, 255, (batch_size, size, size, 3), dtype=np.uint8)),
        "boxes": jnp.asarray(np.tile(
            np.asarray([0.2, 0.2, 0.7, 0.7], np.float32), (batch_size, g, 1))),
        "labels": jnp.asarray(rng.integers(1, 81, (batch_size, g)).astype(np.int32)),
        "valid": jnp.asarray(
            np.tile(np.asarray([True] * 8 + [False] * (g - 8)), (batch_size, 1))),
    }

    # iterations chain through `state`, so the device serializes them; sync
    # via scalar readback (block_until_ready can no-op on the tunneled TPU)
    n = 20
    if args.pipelined:
        prime, pstep = train_lib.make_train_step_pipelined(module, anchors, cfg)
        state, carry = prime(state, dict(batch))
        state, carry, metrics = pstep(state, carry, dict(batch))  # compile
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, carry, metrics = pstep(state, carry, dict(batch))
        _ = float(metrics["loss"])
        t1 = time.perf_counter()
    else:
        state, metrics = step(state, dict(batch))  # compile
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, dict(batch))
        _ = float(metrics["loss"])
        t1 = time.perf_counter()
    r0 = time.perf_counter()
    _ = float(metrics["loss_cls"])
    rtt = time.perf_counter() - r0
    dt = (t1 - t0 - rtt) / n
    name = ("retinanet_r101_fpn_1024px_remat_train_images_per_sec_per_chip"
            if args.config5 else
            "retinanet_r50_fpn_512px_train_images_per_sec_per_chip")
    print(json.dumps({
        "metric": name,
        "value": round(batch_size / dt, 2),
        "unit": "images/sec",
        "loss": round(float(np.asarray(metrics["loss"])), 4),
    }))


if __name__ == "__main__":
    main()
