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


def int8_conv_interceptor(skip_fn=None, min_size: int = 1024):
    """A ``flax.linen.intercept_methods`` interceptor that reroutes every
    eligible ``nn.Conv`` through the dynamic-int8 conv. Thread-safe: the
    int8 implementation is active only for the current thread and only
    inside each intercepted conv's trace."""
    from flax import linen as nn

    skip = skip_fn if skip_fn is not None else _default_int8_skip
    _install_routing_conv()

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if (isinstance(mod, nn.Conv) and context.method_name == "__call__"
                and not skip(mod)):
            _TLS.impl = _int8_dynamic_conv(_TRUE_CONV, min_size)
            try:
                return next_fun(*args, **kwargs)
            finally:
                _TLS.impl = None
        return next_fun(*args, **kwargs)

    return interceptor


def make_quantized_detect_fn(module, anchors_cxcywh, cfg, data_cfg=None,
                             use_pallas: bool | None = None,
                             int8_activations: bool = False):
    """Quantized twin of ``detection.make_detect_fn``:
    ``detect(qvariables, images) -> Detections`` with on-chip dequantize
    fused into the single XLA program.

    ``int8_activations=True`` additionally runs every backbone/FPN/subnet
    conv as s8xs8->s32 on the MXU with dynamic per-tensor activation
    scales (no calibration needed); the final prediction convs stay float.
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

    interceptor = int8_conv_interceptor()

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
                        mode, use_pallas: bool | None = None):
    """One-stop quantized-serving construction shared by Predictor and the
    CLIs: returns ``(detect_fn, serving_variables)`` for the given quantize
    mode ("" = float path, "weights", "full")."""
    mode = normalize_quantize_mode(mode)
    if not mode:
        from shape_based_object_detection_tpu.detection import make_detect_fn

        return (make_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                               use_pallas=use_pallas), variables)
    return (
        make_quantized_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                                 use_pallas=use_pallas,
                                 int8_activations=(mode == "full")),
        quantize_params(variables),
    )
