"""Train-step time breakdown + MFU estimate for the headline training config
(RetinaNet R50-FPN 512px, batch 16, bf16) on the real chip — the published
perf evidence for BASELINE.md (VERDICT r1 weak #7).

Rather than parsing Perfetto traces, the breakdown times each stage as its
own jitted program with the dependent-chain methodology (bench.py): augment
only, forward only, forward+loss (adds matching), and the full step
(adds backward + optimizer). Differences between stages bound where the
step time goes. MFU comes from XLA's own cost analysis of the compiled
full-step executable against the v5e bf16 peak (197 TFLOP/s).

    python tools/profile_train.py [--batch 16] [--trace /tmp/sbd_trace]

--trace additionally records a jax.profiler trace (open with XProf/
Perfetto) around 10 steps.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()

V5E_BF16_PEAK_FLOPS = 1.97e14


def _time_fn(fn, args, n=20, windows=3):
    """Dependent-chain timing: each iter consumes a scalar of the last."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(first).reshape(-1)[0])

    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            leaf = jax.tree_util.tree_leaves(o)[0]
            dep = (jnp.asarray(leaf).reshape(-1)[0] * 0).astype(
                args[-1].dtype if hasattr(args[-1], "dtype") else jnp.float32)
            o = fn(*args[:-1], args[-1] + dep)
        leaf = jax.tree_util.tree_leaves(o)[0]
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(jnp.asarray(leaf).reshape(-1)[0])
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--config", default="config4_retinanet_r101_coco_train")
    p.add_argument("--model", default="retinanet_r50_fpn_512")
    p.add_argument("--trace", default="")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu import train as train_lib
    from shape_based_object_detection_tpu.data.augment import augment_batch
    from shape_based_object_detection_tpu.models.factory import build_model
    from shape_based_object_detection_tpu.ops.matching import match_batch
    from shape_based_object_detection_tpu.losses import detection_loss

    cfg = config_lib.get_config("config2_retinanet_r50_infer")
    model_cfg = dataclasses.replace(cfg.model, dtype="bfloat16")
    train_cfg = config_lib.get_config("config3_ssd512_voc_train").train
    cfg = dataclasses.replace(cfg, model=model_cfg, train=train_cfg)

    module, variables, anchors = build_model(model_cfg)
    state = train_lib.create_train_state(module, variables, cfg)
    step_fn = train_lib.make_train_step(module, anchors, cfg)

    b, s, g = args.batch, model_cfg.image_size, 32
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8))
    boxes = jnp.asarray(
        np.tile(np.asarray([[0.2, 0.2, 0.6, 0.6]], np.float32), (b, g, 1))
        .reshape(b, g, 4))
    labels = jnp.ones((b, g), jnp.int32)
    valid = jnp.asarray(np.tile([True] + [False] * (g - 1), (b, 1)))
    batch = {"images": images, "boxes": boxes, "labels": labels,
             "valid": valid}

    key = jax.random.PRNGKey(0)
    variances = model_cfg.anchors.variances

    @jax.jit
    def aug_only(key, images):
        return augment_batch(key, images, boxes, labels, valid, cfg.data, s)[0]

    @jax.jit
    def fwd_only(variables, images):
        from shape_based_object_detection_tpu.utils.image import (
            normalize_images,
        )

        x = normalize_images(images, cfg.data.mean, cfg.data.std)
        return module.apply(variables, x)[0]

    @jax.jit
    def fwd_loss(variables, images):
        from shape_based_object_detection_tpu.utils.image import (
            normalize_images,
        )

        x = normalize_images(images, cfg.data.mean, cfg.data.std)
        cls_logits, box_offsets = module.apply(variables, x)
        match = match_batch(anchors, boxes, labels, valid, cfg.match,
                            variances)
        loss, _ = detection_loss(cls_logits, box_offsets, match, cfg.loss)
        return loss

    results = {}
    results["augment_ms"] = _time_fn(aug_only, (key, images)) * 1e3
    results["forward_ms"] = _time_fn(fwd_only, (variables, images)) * 1e3
    results["forward_loss_ms"] = _time_fn(fwd_loss, (variables, images)) * 1e3

    # full step: time via repeated donated calls (state is consumed; rebuild)
    def full(state_in, images_in):
        st, metrics = step_fn(state_in, dict(batch, images=images_in))
        return st, metrics

    st = state
    st, m = full(st, images)
    _ = float(np.asarray(m["loss"]))
    n = 20
    best = float("inf")
    for _w in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            dep = (m["loss"] * 0).astype(jnp.uint8)
            st, m = full(st, images + dep)
        _ = float(np.asarray(m["loss"]))
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(np.asarray(m["num_pos"]))
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    results["full_step_ms"] = best * 1e3
    results["train_images_per_sec"] = b / best

    # XLA cost analysis of the compiled full step -> MFU estimate
    try:
        compiled = jax.jit(
            lambda st2, bt: step_fn(st2, bt)
        ).lower(train_lib.create_train_state(module, variables, cfg),
                batch).compile()
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, list) else cost
        flops = float(cost.get("flops", 0.0))
        results["xla_flops_per_step"] = flops
        results["mfu_pct"] = round(
            100.0 * flops / best / V5E_BF16_PEAK_FLOPS, 1)
    except Exception as e:  # cost analysis is best-effort
        results["cost_analysis_error"] = str(e)

    results["derived"] = {
        "matching_plus_loss_ms": round(
            results["forward_loss_ms"] - results["forward_ms"], 2),
        "backward_plus_update_ms": round(
            results["full_step_ms"] - results["forward_loss_ms"]
            - results["augment_ms"], 2),
    }
    for k in ("augment_ms", "forward_ms", "forward_loss_ms", "full_step_ms",
              "train_images_per_sec"):
        results[k] = round(results[k], 2)

    if args.trace:
        with jax.profiler.trace(args.trace):
            for _ in range(10):
                dep = (m["loss"] * 0).astype(jnp.uint8)
                st, m = full(st, images + dep)
            jax.block_until_ready(m["loss"])
        results["trace_dir"] = args.trace

    print(json.dumps(results))


if __name__ == "__main__":
    main()
