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


def make_quantized_detect_fn(module, anchors_cxcywh, cfg, data_cfg=None,
                             use_pallas: bool | None = None):
    """Quantized twin of ``detection.make_detect_fn``:
    ``detect(qvariables, images) -> Detections`` with on-chip dequantize
    fused into the single XLA program.
    """
    from shape_based_object_detection_tpu.detection import make_detect_fn

    inner = make_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                           use_pallas=use_pallas)

    @jax.jit
    def detect(qvariables, images):
        return inner(dequantize_params(qvariables), images)

    return detect
