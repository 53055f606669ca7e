"""Microbenchmark: ResNet stem conv (7x7/s2 on 3 channels) vs its
space-to-depth rewrite — the MLPerf-era TPU trick where the image is
rearranged HxWx3 -> (H/2)x(W/2)x12 and the 7x7/s2 kernel becomes an
equivalent 4x4/s1 kernel, raising the MXU contraction-dim utilization of
the first conv (3 input channels pack poorly into HBM->VMEM tiles).

Equivalence (exact, same MACs reassociated): zero-pad the 7x7 kernel to 8x8
at the FRONT of each spatial dim (K8[0]=0) and shift the padding from (3,3)
to (4,3); then taps x[2i-4 .. 2i+3] cover exactly four 2x2 cells, so
K2[a,b,(r,s,c)] = K8[2a+r, 2b+s, c] with cell padding (2,1) reproduces the
conv. This tool measures both on real shapes and checks max|delta|.

    python tools/microbench_stem.py [--batch 16] [--size 512] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from shape_based_object_detection_tpu.utils.platform import honor_jax_platforms_env

honor_jax_platforms_env()


def _time(fn, x, n=50, windows=3):
    import jax
    import jax.numpy as jnp

    out = fn(x)
    _ = float(out.reshape(-1)[0])
    dep = (out.reshape(-1)[0] * 0).astype(x.dtype)
    out = fn(x + dep)
    _ = float(out.reshape(-1)[0])
    _ = float(out.reshape(-1)[1])
    best = float("inf")
    for _w in range(windows):
        t0 = time.perf_counter()
        o = out
        for _ in range(n):
            dep = (o.reshape(-1)[0] * 0).astype(x.dtype)
            o = fn(x + dep)
        _ = float(o.reshape(-1)[0])
        t1 = time.perf_counter()
        r0 = time.perf_counter()
        _ = float(o.reshape(-1)[1])
        rtt = time.perf_counter() - r0
        best = min(best, (t1 - t0 - rtt) / n)
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--ch", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from shape_based_object_detection_tpu.utils.cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    dt = jnp.dtype(args.dtype)
    rng = np.random.default_rng(0)
    b, s, co = args.batch, args.size, args.ch
    x = jnp.asarray(rng.normal(0, 1, (b, s, s, 3)), dt)
    k = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, co)), dt)

    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def direct(x):
        return jax.lax.conv_general_dilated(
            x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)

    # space-to-depth variant (built once at trace time from the same k)
    k8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))  # zero row/col in FRONT
    # K2[a,b,(r,s,c)] = K8[2a+r, 2b+s, c]; input cell layout is (r,s,c)
    k2 = k8.reshape(4, 2, 4, 2, 3, co).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(4, 4, 12, co)

    @jax.jit
    def s2d(x):
        h = x.shape[1] // 2
        w = x.shape[2] // 2
        # (B, H, W, 3) -> (B, H/2, W/2, (r, s, c)) matching K2's cell layout
        xx = x.reshape(b, h, 2, w, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        xx = xx.reshape(b, h, w, 12)
        dn2 = jax.lax.conv_dimension_numbers(xx.shape, k2.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xx, k2, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn2)

    @jax.jit
    def s2d_conv_only(xx):
        """The 4x4/s1 conv on a pre-rearranged input — what the stem costs
        if the cell rearrange is fused into the producer (e.g. the
        augmentation warp emits (H/2, W/2, 12) directly)."""
        dn2 = jax.lax.conv_dimension_numbers(xx.shape, k2.shape,
                                             ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            xx, k2, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn2)

    @jax.jit
    def rearrange_only(x):
        h, w = x.shape[1] // 2, x.shape[2] // 2
        xx = x.reshape(b, h, 2, w, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        return xx.reshape(b, h, w, 12)

    a = np.asarray(direct(x), np.float32)
    c = np.asarray(s2d(x), np.float32)
    assert a.shape == c.shape, (a.shape, c.shape)
    delta = float(np.max(np.abs(a - c)))

    xx = rearrange_only(x)
    t_direct = _time(direct, x) * 1e3
    t_s2d = _time(s2d, x) * 1e3
    t_conv_only = _time(s2d_conv_only, xx) * 1e3
    t_rearrange = _time(rearrange_only, x) * 1e3
    print(json.dumps({
        "batch": b, "size": s, "dtype": args.dtype,
        "direct_ms": round(t_direct, 3),
        "s2d_ms": round(t_s2d, 3),
        "s2d_conv_only_ms": round(t_conv_only, 3),
        "rearrange_only_ms": round(t_rearrange, 3),
        "speedup": round(t_direct / t_s2d, 3),
        "speedup_conv_only": round(t_direct / t_conv_only, 3),
        "max_abs_delta": delta,
    }))


if __name__ == "__main__":
    main()
