"""AOT model export: serialize detect() to a portable StableHLO artifact.

The reference's deployment story is "load the torch checkpoint and run the
Python model code" (SURVEY.md §3.2). The TPU-native equivalent is ahead-of-
time export: ``jax.export`` lowers the whole jitted detect program (normalize
-> backbone/heads -> decode -> class-aware NMS -> top-k) to versioned
StableHLO with the weights embedded as constants, so a serving process can
run the model with NO model-building Python, on any platform the artifact
was exported for (TPU and/or CPU), with forward/backward-compatibility
guarantees handled by StableHLO versioning.

Artifact = a single ``bytes`` blob; by convention saved as ``*.sbdx``.
"""

from __future__ import annotations

import dataclasses
import io
import json
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from shape_based_object_detection_tpu.config import ModelConfig, DataConfig
from shape_based_object_detection_tpu.detection import make_detect_fn
from shape_based_object_detection_tpu.ops.nms import Detections

_MAGIC = b"SBDX0001"

# The artifact's output pytree is the Detections namedtuple; teach
# jax.export to serialize it (idempotent across re-imports).
try:
    jax.export.register_namedtuple_serialization(
        Detections, serialized_name="sbd.Detections")
except ValueError:
    pass


def export_detect(
    module,
    variables,
    anchors_cxcywh: jnp.ndarray,
    cfg: ModelConfig,
    data_cfg: DataConfig | None = None,
    batch_size: int = 8,
    platforms: Sequence[str] = ("tpu", "cpu"),
    quantize: bool = False,
    int8_activations: bool = False,
    activation_scales=None,
) -> bytes:
    """Export detect() for a fixed batch shape with weights embedded.

    Returns a self-describing blob: magic | header-json | jax.export payload.
    The header records the input spec and config so a loader needs nothing
    else. NMS uses the portable scan backend so one artifact runs on every
    exported platform (the Pallas kernel is TPU-only and not exportable
    across platforms). ``quantize=True`` embeds int8 weight-only quantized
    constants (quantize.py) — ~4x smaller artifact, dequantize fused on-chip.
    ``int8_activations=True`` additionally bakes the s8xs8->s32 conv
    path into the exported program (quantize.py; plain StableHLO ops, so it
    stays portable across the exported platforms) — with dynamic per-image
    activation scales, or calibrated static ones when ``activation_scales``
    (a ``quantize.calibrate_activation_scales`` dict or saved JSON path) is
    given: the scales become baked constants, removing the on-chip abs-max
    reductions (the measured batch-throughput serving artifact —
    BASELINE.md).
    """
    if int8_activations and not quantize:
        raise ValueError("int8_activations=True requires quantize=True (it "
                         "is a tier on top of int8 weights)")
    if activation_scales is not None and not int8_activations:
        raise ValueError("activation_scales requires int8_activations=True")
    detect = make_detect_fn(module, anchors_cxcywh, cfg, data_cfg,
                            use_pallas=False)
    if quantize:
        from flax import linen as nn

        from shape_based_object_detection_tpu.quantize import (
            dequantize_params, int8_conv_interceptor, quantize_params,
        )

        variables = quantize_params(variables)
        inner_detect = detect

        if int8_activations:
            from shape_based_object_detection_tpu.quantize import (
                load_activation_scales,
            )

            if isinstance(activation_scales, str):
                activation_scales = load_activation_scales(activation_scales)
            interceptor = int8_conv_interceptor(
                activation_scales=activation_scales)

            def detect(variables, images):
                with nn.intercept_methods(interceptor):
                    return inner_detect(dequantize_params(variables), images)
        else:

            def detect(variables, images):
                return inner_detect(dequantize_params(variables), images)

    def detect_images(images):  # weights closed over -> embedded as consts
        return detect(variables, images)

    size = cfg.image_size
    spec = jax.ShapeDtypeStruct((batch_size, size, size, 3), jnp.uint8)
    exported = jax.export.export(
        jax.jit(detect_images), platforms=list(platforms))(spec)
    header = json.dumps({
        "model": cfg.name,
        "image_size": size,
        "batch_size": batch_size,
        "platforms": list(platforms),
        "num_classes": cfg.num_classes,
        "quantized": quantize,
        "int8_activations": bool(quantize and int8_activations),
        "activation_scale_mode": (
            "" if not (quantize and int8_activations)
            else "static" if activation_scales is not None else "dynamic"),
        # serving-side prepare/unpack must match the preprocessing the
        # weights were trained/evaluated with (ArtifactPredictor reads this)
        "letterbox": bool(data_cfg.letterbox) if data_cfg else False,
        "outputs": ["boxes", "scores", "labels", "valid"],
    }).encode()
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(len(header).to_bytes(8, "little"))
    buf.write(header)
    buf.write(exported.serialize())
    return buf.getvalue()


@dataclasses.dataclass
class LoadedModel:
    """A deserialized detect artifact: callable without any model code."""

    header: dict
    _call: Callable

    def __call__(self, images) -> Detections:
        """images: (batch_size, S, S, 3) uint8 -> Detections."""
        out = self._call(jnp.asarray(images))
        # jax.export flattens the output pytree to a tuple; rewrap.
        if isinstance(out, Detections):
            return out
        return Detections(*out)


def load_detect(blob: bytes) -> LoadedModel:
    """Deserialize an ``export_detect`` artifact into a callable."""
    if blob[:8] != _MAGIC:
        raise ValueError("not an SBDX artifact (bad magic)")
    hlen = int.from_bytes(blob[8:16], "little")
    if len(blob) < 16 + hlen:
        raise ValueError("truncated SBDX artifact")
    header = json.loads(blob[16:16 + hlen].decode())
    exported = jax.export.deserialize(blob[16 + hlen:])
    return LoadedModel(header=header, _call=exported.call)


def save_artifact(blob: bytes, path: str) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_artifact(path: str) -> LoadedModel:
    with open(path, "rb") as f:
        return load_detect(f.read())


def export_from_config(
    experiment_cfg,
    variables=None,
    batch_size: int = 8,
    platforms: Sequence[str] = ("tpu", "cpu"),
    quantize: bool = False,
    int8_activations: bool = False,
    activation_scales=None,
    dtype: str | None = None,
) -> bytes:
    """Convenience: build the model from an ExperimentConfig and export.

    ``variables=None`` exports fresh-initialized weights (artifact-format
    tests); pass restored variables for a real deployment. ``dtype`` overrides
    the compute dtype baked into the artifact (e.g. "bfloat16" to ship the
    TPU-throughput configuration).
    """
    from shape_based_object_detection_tpu.models.factory import build_model

    model_cfg = experiment_cfg.model
    if dtype is not None:
        model_cfg = dataclasses.replace(model_cfg, dtype=dtype)
    module, init_vars, anchors = build_model(model_cfg)
    return export_detect(
        module, variables if variables is not None else init_vars, anchors,
        model_cfg, experiment_cfg.data, batch_size, platforms,
        quantize=quantize, int8_activations=int8_activations,
        activation_scales=activation_scales)
