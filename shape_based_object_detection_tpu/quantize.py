"""Weight-only int8 quantization for serving (production inference path).

The reference family serves float32 weights through eager PyTorch
(SURVEY.md §3.2); there is no quantized path to mirror, so this is designed
TPU-first: every conv/dense ``kernel`` leaf is stored as per-output-channel
symmetric int8 plus a float scale vector, and the dequantize
(``int8 -> f32 * scale``) happens on-chip inside the same jitted detect
program. XLA fuses the cast+multiply into the weight load, so serving weight
HBM traffic drops ~4x vs float32 (~2x vs bf16). The win shows up at small
batch, where streaming weights — not MXU compute on activations — bounds
latency; at large batch the path costs nothing (same conv FLOPs).

Composes with AOT export (export.py): quantized weights are embedded as int8
constants, shrinking the serving artifact ~4x as well.

Non-kernel leaves (biases, BN stats and scales, L2Norm scales) pass through
unquantized — they are vectors, irrelevant to footprint and parity-sensitive.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """A per-output-channel symmetric int8 tensor: ``w ~= q * scale``.

    ``q``: int8, original shape. ``scale``: float32, shape broadcastable to
    ``q`` (original shape with all but the output-channel axis reduced to 1).
    NamedTuple => already a pytree; flows through jit/export/tree ops.
    """

    q: jnp.ndarray
    scale: jnp.ndarray

    def dequantize(self) -> jnp.ndarray:
        return self.q.astype(self.scale.dtype) * self.scale


def quantize_tensor(w: jnp.ndarray, channel_axis: int = -1) -> QTensor:
    """Symmetric int8 quantization, one scale per output channel.

    Flax convs are HWIO and dense kernels are IO — the output channel is the
    last axis for both, so ``channel_axis=-1`` is correct for every ``kernel``
    leaf in this codebase.
    """
    w = jnp.asarray(w)
    reduce_axes = tuple(i for i in range(w.ndim)
                        if i != channel_axis % w.ndim)
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = (jnp.maximum(amax, 1e-12) / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return QTensor(q=q.astype(jnp.int8), scale=scale)


def _is_qtensor(x) -> bool:
    return isinstance(x, QTensor)


def quantize_params(variables, min_size: int = 1024):
    """Quantize every conv/dense kernel in a flax variables pytree.

    A leaf is quantized iff its path ends in ``kernel``, it has rank >= 2,
    and it holds at least ``min_size`` elements (tiny kernels aren't worth
    the quantization error). Everything else passes through unchanged, so
    the result feeds ``module.apply`` after :func:`dequantize_params`.
    """

    def maybe_quantize(path, leaf):
        last = path[-1]
        name = getattr(last, "key", getattr(last, "name", None))
        if (name == "kernel" and hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.size >= min_size):
            return quantize_tensor(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_quantize, variables)


def dequantize_params(qvariables):
    """Inverse of :func:`quantize_params` (lossy): QTensor -> float array.

    Call INSIDE jit so the int8->float expansion happens on-chip and fuses
    into the consuming conv; the HBM-resident weights stay int8.
    """
    return jax.tree_util.tree_map(
        lambda x: x.dequantize() if _is_qtensor(x) else x,
        qvariables,
        is_leaf=_is_qtensor,
    )


def quantized_bytes(qvariables) -> int:
    """Total parameter bytes as stored (int8 + scales + passthrough)."""
    return sum(
        x.nbytes for x in jax.tree_util.tree_leaves(qvariables)
    )


# ---------------------------------------------------------------------------
# Full int8 (activations + weights on the MXU)
# ---------------------------------------------------------------------------
#
# v5e int8 peak is 2x bf16 (394 vs 197 T(FL)OP/s). Measured on this chip
# (2026-08-17, 16x512px R50-family conv shapes): s8xs8->s32 convs run
# 1.4-1.7x bf16 on the 3x3 stages, ~1.0x on 1x1, and ~1.2-1.3x end-to-end
# including the dynamic activation quantize + dequant epilogue — so the full
# int8 path is the high-throughput serving configuration on top of the
# weight-streaming win of weight-only mode.
#
# Design: activations are quantized DYNAMICALLY (per-IMAGE symmetric scale
# from each batch element's own abs-max, computed on-chip) so no calibration
# data is needed AND a given image's detections never depend on what it was
# co-batched with (batch padding / request mix); weights per-output-channel
# as above. The int8 conv is injected via a flax method interceptor around
# each ``nn.Conv.__call__`` — model code is untouched, and the final
# prediction convs (RetinaNet "predict", SSD "loc_*/cls_*") stay in
# bf16/f32 for accuracy (they are also the cheapest).
#
# The weights the interceptor sees are the already-dequantized QTensors, so
# it re-derives the per-channel scale and re-rounds; quantize_tensor's scale
# makes that round-trip bit-exact (round(q*s/s) == q), and the cost is a few
# elementwise passes over the weights (~0.1 ms at R50 scale) — accepted to
# keep the interceptor independent of how params are stored.


def _default_int8_skip(module) -> bool:
    """Skip the accuracy-critical final prediction convs."""
    name = module.name or ""
    return name == "predict" or name.startswith(("loc_", "cls_"))


def _module_path_key(module) -> str:
    """Stable string identity for a conv inside an apply (calibration
    records and static-scale lookup share it)."""
    path = getattr(module, "path", None)
    if path is None:  # older flax: go through the scope
        path = module.scope.path
    return "/".join(str(p) for p in path)


def _conv_eligible(lhs, kernel_size, in_features: int, features: int,
                   min_size: int, groups: int = 1) -> bool:
    """Mirror of the runtime SIZE/RANK eligibility test in the int8 conv
    impls, computable BEFORE the conv runs (from the module + its input):
    2D conv with a kernel of at least ``min_size`` elements. ``groups`` is
    the conv's feature_group_count (HWIO kernel in-dim is in/groups).

    Deliberately NO dtype test here: flax promotes the nn.Conv input before
    the lax conv, so the pre-promotion dtype can differ from what the impls
    see — the impls themselves re-check the (post-promotion) operand dtype
    and pass ineligible convs through, keeping the static and dynamic tiers
    quantizing the identical conv set."""
    import numpy as np

    del lhs  # shape-independent; kept for call-site symmetry
    if isinstance(kernel_size, int):  # flax accepts a bare int for NxN
        kernel_size = (kernel_size, kernel_size)
    if len(kernel_size) != 2:
        return False
    ksize = (int(np.prod(kernel_size)) * (int(in_features) // int(groups))
             * int(features))
    return ksize >= min_size


def _int8_dynamic_conv(orig_conv, min_size: int):
    """Wrap ``lax.conv_general_dilated``: float-in/float-out, s8xs8->s32
    compute. Per-image activation scale (dynamic), per-output-channel
    weight scale; tiny or already-integer convs pass through."""

    def conv(lhs, rhs, *args, **kwargs):
        if (rhs.ndim != 4 or rhs.size < min_size
                or jnp.issubdtype(lhs.dtype, jnp.integer)):
            return orig_conv(lhs, rhs, *args, **kwargs)
        out_dtype = lhs.dtype
        # NHWC: reduce per batch element so results are independent of the
        # rest of the batch (serving reproducibility across request mixes)
        ls = jnp.maximum(
            jnp.max(jnp.abs(lhs).astype(jnp.float32), axis=(1, 2, 3),
                    keepdims=True),
            1e-6) / 127.0
        lq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / ls),
                      -127, 127).astype(jnp.int8)
        # HWIO: out channel is the last axis
        ws = jnp.maximum(
            jnp.max(jnp.abs(rhs).astype(jnp.float32), axis=(0, 1, 2)),
            1e-12) / 127.0
        wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / ws),
                      -127, 127).astype(jnp.int8)
        kwargs = dict(kwargs)
        kwargs["preferred_element_type"] = jnp.int32
        kwargs.pop("precision", None)  # float-only knob
        out = orig_conv(lq, wq, *args, **kwargs)
        # ls: (B,1,1,1), ws: (O,) -> (B,1,1,O) per-image-per-channel dequant
        return (out.astype(jnp.float32) * (ls * ws)).astype(out_dtype)

    return conv


def _int8_static_conv(orig_conv, min_size: int, act_scale: float):
    """Static-scale twin of :func:`_int8_dynamic_conv`: the activation scale
    is a CALIBRATED compile-time constant (``act_scale`` = calibration
    abs-max / 127), so the per-batch abs-max reduction — the serialized
    critical-path cost that makes dynamic int8 lose at small batch —
    disappears (measured: the batch-serving throughput champion;
    BASELINE.md). Activations beyond the calibration range clip to +-127
    (standard PTQ)."""
    ls = float(act_scale)

    def conv(lhs, rhs, *args, **kwargs):
        if (rhs.ndim != 4 or rhs.size < min_size
                or jnp.issubdtype(lhs.dtype, jnp.integer)):
            return orig_conv(lhs, rhs, *args, **kwargs)
        out_dtype = lhs.dtype
        lq = jnp.clip(jnp.round(lhs.astype(jnp.float32) / ls),
                      -127, 127).astype(jnp.int8)
        ws = jnp.maximum(
            jnp.max(jnp.abs(rhs).astype(jnp.float32), axis=(0, 1, 2)),
            1e-12) / 127.0
        wq = jnp.clip(jnp.round(rhs.astype(jnp.float32) / ws),
                      -127, 127).astype(jnp.int8)
        kwargs = dict(kwargs)
        kwargs["preferred_element_type"] = jnp.int32
        kwargs.pop("precision", None)  # float-only knob
        out = orig_conv(lq, wq, *args, **kwargs)
        return (out.astype(jnp.float32) * (ls * ws)).astype(out_dtype)

    return conv


# flax's nn.Conv calls ``lax.conv_general_dilated`` through the module-level
# ``lax`` import in flax.linen.linear; rerouting it is how the interceptor
# injects int8 compute without touching model code. A naive
# patch/restore-per-conv is a race under concurrent tracing (another thread
# could capture the patched fn as its "original", making the patch
# permanent), so instead a ROUTING wrapper is installed exactly once and
# never removed: it forwards to the true conv unless the *current thread*
# has an int8 implementation active. Other threads — and this thread outside
# the interceptor scope — always get the true conv.
import threading as _threading

_TRUE_CONV = None
_INSTALL_LOCK = _threading.Lock()
_TLS = _threading.local()


class _LaxProxy:
    """Stand-in for flax.linen.linear's module-level ``lax`` binding:
    ``conv_general_dilated`` routes through the thread-local int8 hook,
    everything else forwards to the real jax.lax. Assigning this PROXY to
    ``flax.linen.linear.lax`` scopes the patch to flax's conv call site —
    setting the attribute on the bound module directly would mutate
    ``jax.lax`` itself (the binding IS the module object), monkey-patching
    conv_general_dilated process-wide for every jax user."""

    def __init__(self, true_lax, routing_conv):
        self._true_lax = true_lax
        self.conv_general_dilated = routing_conv

    def __getattr__(self, name):  # only called for attrs not set above
        return getattr(self._true_lax, name)


def _install_routing_conv() -> None:
    global _TRUE_CONV
    from flax.linen import linear as _flax_linear

    with _INSTALL_LOCK:
        if _TRUE_CONV is not None:
            return
        _TRUE_CONV = _flax_linear.lax.conv_general_dilated

        def routing_conv(*args, **kwargs):
            impl = getattr(_TLS, "impl", None)
            if impl is None:
                return _TRUE_CONV(*args, **kwargs)
            return impl(*args, **kwargs)

        _flax_linear.lax = _LaxProxy(_flax_linear.lax, routing_conv)


def int8_conv_interceptor(skip_fn=None, min_size: int = 1024,
                          activation_scales=None):
    """A ``flax.linen.intercept_methods`` interceptor that reroutes every
    eligible ``nn.Conv`` through the int8 conv. Thread-safe: the
    int8 implementation is active only for the current thread and only
    inside each intercepted conv's trace.

    ``activation_scales``: None for dynamic per-image scales (no calibration
    needed), or a ``{module_path: abs_max}`` dict from
    :func:`calibrate_activation_scales` for static scales (faster —
    removes the on-chip abs-max reductions; the latency-serving tier).
    A calibrated dict missing an eligible conv raises at trace time — a
    stale scales file must not silently fall back to different numerics."""
    from flax import linen as nn

    skip = skip_fn if skip_fn is not None else _default_int8_skip
    _install_routing_conv()

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv) and context.method_name == "__call__"
                and not skip(mod)):
            if activation_scales is None:
                impl = _int8_dynamic_conv(_TRUE_CONV, min_size)
            elif not _conv_eligible(args[0], mod.kernel_size,
                                    args[0].shape[-1], mod.features,
                                    min_size,
                                    groups=mod.feature_group_count):
                impl = None  # too small / integer input: stays float
            else:
                key = _module_path_key(mod)
                amax = activation_scales.get(key)
                if amax is None:
                    raise ValueError(
                        f"no calibrated activation scale for conv {key!r} — "
                        "re-run calibrate_activation_scales on this model "
                        "(the scales file does not match the model/skip set)")
                impl = _int8_static_conv(
                    _TRUE_CONV, min_size, max(float(amax), 1e-6) / 127.0)
            if impl is None:
                return next_fun(*args, **kwargs)
            _TLS.impl = impl
            try:
                return next_fun(*args, **kwargs)
            finally:
                _TLS.impl = None
        return next_fun(*args, **kwargs)

    return interceptor


def calibrate_activation_scales(module, variables, batches, data_cfg=None,
                                skip_fn=None, min_size: int = 1024):
    """One-time PTQ calibration: run the float forward over ``batches``
    (an iterable of (B, H, W, 3) uint8 arrays) recording each eligible
    conv's input abs-max, reduced over all batches. Returns a JSON-able
    ``{module_path: abs_max}`` dict for
    ``int8_conv_interceptor(activation_scales=...)`` /
    ``make_serving_detect(mode="full", activation_scales=...)``.

    Calibration uses the plain forward (no postprocess); batches should be
    representative serving inputs. The recording happens inside one jitted
    program per batch shape — traced amaxes are returned as outputs, so
    calibration runs at device speed."""
    from flax import linen as nn

    from shape_based_object_detection_tpu.utils import image as image_lib

    mean = data_cfg.mean if data_cfg else image_lib.IMAGENET_MEAN
    std = data_cfg.std if data_cfg else image_lib.IMAGENET_STD
    skip = skip_fn if skip_fn is not None else _default_int8_skip

    def recording_interceptor(records):
        def interceptor(next_fun, args, kwargs, context):
            mod = context.module
            if (isinstance(mod, nn.Conv)
                    and context.method_name == "__call__"
                    and not skip(mod)
                    and _conv_eligible(args[0], mod.kernel_size,
                                       args[0].shape[-1], mod.features,
                                       min_size,
                                       groups=mod.feature_group_count)):
                key = _module_path_key(mod)
                amax = jnp.max(jnp.abs(args[0]).astype(jnp.float32))
                prev = records.get(key)
                records[key] = amax if prev is None else jnp.maximum(prev,
                                                                     amax)
            return next_fun(*args, **kwargs)

        return interceptor

    @jax.jit
    def one_batch(variables, images):
        records = {}
        x = image_lib.normalize_images(images, mean, std)
        with nn.intercept_methods(recording_interceptor(records)):
            module.apply(variables, x)
        return records

    amaxes = {}
    n_batches = 0
    for images in batches:
        n_batches += 1
        rec = jax.device_get(one_batch(variables, jnp.asarray(images)))
        for k, v in rec.items():
            amaxes[k] = max(amaxes.get(k, 0.0), float(v))
    if n_batches == 0:
        raise ValueError("calibration received no batches — check the data "
                         "feed (e.g. a dataset smaller than the batch size "
                         "yields zero full batches)")
    if not amaxes:
        raise ValueError("calibration saw no eligible convs — check the "
                         "model/skip_fn/min_size")
    return amaxes


def save_activation_scales(path: str, amaxes) -> None:
    """Persist calibration output as JSON (tools/CLIs interchange format)."""
    import json

    with open(path, "w") as f:
        json.dump(amaxes, f, indent=1, sort_keys=True)


def load_activation_scales(path: str):
    import json

    with open(path) as f:
        scales = json.load(f)
    if not isinstance(scales, dict) or not scales:
        raise ValueError(f"{path} is not an activation-scales dict")
    return {str(k): float(v) for k, v in scales.items()}


def make_quantized_detect_fn(module, anchors_cxcywh, cfg, data_cfg=None,
                             use_pallas: bool | None = None,
                             int8_activations: bool = False,
                             activation_scales=None):
    """Quantized twin of ``detection.make_detect_fn``:
    ``detect(qvariables, images) -> Detections`` with on-chip dequantize
    fused into the single XLA program.

    ``int8_activations=True`` additionally runs every backbone/FPN/subnet
    conv as s8xs8->s32 on the MXU with dynamic per-tensor activation
    scales (no calibration needed); the final prediction convs stay float.
    ``activation_scales`` (a :func:`calibrate_activation_scales` dict)
    switches those convs to calibrated STATIC scales — compile-time
    constants, no on-chip abs-max reductions: the measured batch-serving
    THROUGHPUT tier, and it repairs dynamic-full's batch-1 collapse
    (weight-only remains the batch-1 latency pick — BASELINE.md).
    """
    from flax import linen as nn

    from shape_based_object_detection_tpu.detection import make_detect_fn

    inner = make_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                           use_pallas=use_pallas)

    if not int8_activations:
        @jax.jit
        def detect(qvariables, images):
            return inner(dequantize_params(qvariables), images)

        return detect

    interceptor = int8_conv_interceptor(activation_scales=activation_scales)

    @jax.jit
    def detect_int8(qvariables, images):
        with nn.intercept_methods(interceptor):
            return inner(dequantize_params(qvariables), images)

    return detect_int8


def normalize_quantize_mode(mode) -> str:
    """Canonicalize a user-facing quantize mode to "" | "weights" | "full".

    Accepts False/None/"" (off), True/"weights" (weight-only int8), and
    "full" (weights + dynamic-int8 activations). Anything else raises — a
    misspelled mode must not silently fall back to a different tier.
    """
    if mode in (False, None, ""):
        return ""
    if mode in (True, "weights"):
        return "weights"
    if mode == "full":
        return "full"
    raise ValueError(
        f"unknown quantize mode {mode!r}: expected False/True, 'weights', "
        "or 'full'")


def make_serving_detect(module, anchors_cxcywh, cfg, data_cfg, variables,
                        mode, use_pallas: bool | None = None,
                        activation_scales=None):
    """One-stop quantized-serving construction shared by Predictor and the
    CLIs: returns ``(detect_fn, serving_variables)`` for the given quantize
    mode ("" = float path, "weights", "full"). ``activation_scales``
    (dict, or a path to a JSON file saved by :func:`save_activation_scales`)
    makes "full" use calibrated static scales instead of dynamic ones."""
    mode = normalize_quantize_mode(mode)
    if isinstance(activation_scales, str):
        activation_scales = load_activation_scales(activation_scales)
    if activation_scales is not None and mode != "full":
        raise ValueError(
            "activation_scales only applies to quantize mode 'full'")
    if not mode:
        from shape_based_object_detection_tpu.detection import make_detect_fn

        return (make_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                               use_pallas=use_pallas), variables)
    return (
        make_quantized_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                                 use_pallas=use_pallas,
                                 int8_activations=(mode == "full"),
                                 activation_scales=activation_scales),
        quantize_params(variables),
    )
