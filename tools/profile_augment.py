"""Stage-level timing of the fused on-device augmentation (data/augment.py)
at the headline training shape (batch 16, 512px) — identifies where the
~8 ms augment stage of the train step goes.

Each variant is its own jitted program timed with the dependent-chain
methodology (bench.py). Differences between variants bound each stage:
full pipeline, no-photometric, no-warp (geometry identity), warp-only,
normalize-only.

CAVEAT (measured 2026-08-17): the chained harness carries a ~1.4 ms
per-iteration dispatch floor on the tunneled runtime, and a standalone
small program pays it 2-3x (dep-add + main program). Absolute numbers
below ~10 ms are therefore inflated; trust the DIFFERENCES between
variants, and for the augment stage's true in-step cost use the
bench_train.py augment-on/off delta (~2 ms — XLA fuses most of the
pipeline into surrounding ops).

    python tools/profile_augment.py [--batch 16] [--size 512]
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def _time_fn(fn, args, n=30, windows=3):
    import jax.numpy as jnp

    out = fn(*args)
    _ = float(jnp.asarray(out[0]).reshape(-1)[0])
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            dep = (jnp.asarray(out[0]).reshape(-1)[0] * 0).astype(
                args[1].dtype)
            out = fn(args[0], args[1] + dep, *args[2:])
        _ = float(jnp.asarray(out[0]).reshape(-1)[0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(jnp.asarray(out[0]).reshape(-1)[1])
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    return best * 1e3


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.data import augment
    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()
    cfg = config_lib.get_config("config2_retinanet_r50_infer").data

    rng = np.random.default_rng(0)
    b, s = args.batch, args.size
    images = jnp.asarray(
        rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        np.sort(rng.uniform(0, 1, (b, 100, 2, 2)), axis=2)
        .transpose(0, 1, 3, 2).reshape(b, 100, 4).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, 81, (b, 100)).astype(np.int32))
    valid = jnp.asarray(rng.uniform(size=(b, 100)) < 0.2)
    key = jax.random.key(0)

    variants = {
        "full": cfg,
        "no_photometric": dataclasses.replace(cfg, photometric=False),
        "no_geometry": dataclasses.replace(
            cfg, expand=False, random_crop=False),
        "geometry_only": dataclasses.replace(
            cfg, photometric=False, hflip=False),
        "normalize_only": dataclasses.replace(
            cfg, photometric=False, expand=False, random_crop=False,
            hflip=False),
    }
    results = {}
    for name, dc in variants.items():
        fn = jax.jit(functools.partial(
            augment.augment_batch, cfg=dc, out_size=s))
        results[name + "_ms"] = round(
            _time_fn(fn, (key, images, boxes, labels, valid)), 3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
