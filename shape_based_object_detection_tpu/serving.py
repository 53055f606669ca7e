"""Batched inference serving (the production-deployment surface).

Wraps the jitted detect program behind a fixed-batch `Predictor`: requests of
any count are padded to the compiled batch size (one compile per model), run
on device, and unpadded on return — the serving-side counterpart of the
static-shape discipline used everywhere else. Double-buffered `submit/poll`
lets callers overlap host pre/post-processing with device execution (JAX
dispatch is async; blocking happens only when results are read).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp

from shape_based_object_detection_tpu.config import ExperimentConfig
from shape_based_object_detection_tpu.detection import make_detect_fn
from shape_based_object_detection_tpu.models.factory import build_model


@dataclasses.dataclass
class Detection:
    boxes: np.ndarray  # (K, 4) pixel xyxy in the original image frame
    scores: np.ndarray  # (K,)
    labels: np.ndarray  # (K,) 0-based foreground class ids


class Predictor:
    """detect() as a service: fixed batch, padded, async-dispatch friendly."""

    def __init__(self, cfg: ExperimentConfig, variables=None, batch_size: int = 8,
                 min_score: float = 0.0, quantize: bool = False):
        self.cfg = cfg
        self.batch_size = batch_size
        self.min_score = min_score
        self.size = cfg.model.image_size
        module, init_vars, anchors = build_model(cfg.model)
        self.variables = variables if variables is not None else init_vars
        if quantize:
            # int8 weight-only serving path (quantize.py): ~4x smaller
            # HBM-resident weights, dequantized on-chip inside the program.
            from shape_based_object_detection_tpu.quantize import (
                make_quantized_detect_fn, quantize_params,
            )

            self.variables = quantize_params(self.variables)
            self._detect = make_quantized_detect_fn(
                module, anchors, cfg.model, cfg.data)
        else:
            self._detect = make_detect_fn(module, anchors, cfg.model, cfg.data)
        self._pending: Optional[Tuple] = None

    def _prepare(self, images: Sequence[np.ndarray]) -> Tuple[jnp.ndarray, list]:
        from PIL import Image

        assert len(images) <= self.batch_size
        batch = np.zeros((self.batch_size, self.size, self.size, 3), np.uint8)
        sizes = []
        for i, img in enumerate(images):
            h, w = img.shape[:2]
            sizes.append((h, w))
            batch[i] = np.asarray(
                Image.fromarray(img).resize((self.size, self.size),
                                            Image.BILINEAR))
        return jnp.asarray(batch), sizes

    def submit(self, images: Sequence[np.ndarray]) -> None:
        """Dispatch a batch without blocking (device runs while host works)."""
        assert self._pending is None, "poll() the previous batch first"
        dev_batch, sizes = self._prepare(images)
        det = self._detect(self.variables, dev_batch)  # async dispatch
        self._pending = (det, sizes)

    def poll(self) -> List[Detection]:
        """Block on the in-flight batch and return unpadded detections."""
        assert self._pending is not None
        det, sizes = self._pending
        self._pending = None
        boxes = np.asarray(det.boxes)
        scores = np.asarray(det.scores)
        labels = np.asarray(det.labels)
        valid = np.asarray(det.valid)
        out = []
        for i, (h, w) in enumerate(sizes):
            keep = valid[i] & (scores[i] >= self.min_score)
            bx = boxes[i][keep] * np.asarray([w, h, w, h], np.float32)
            out.append(Detection(boxes=bx, scores=scores[i][keep],
                                 labels=labels[i][keep]))
        return out

    def predict(self, images: Sequence[np.ndarray]) -> List[Detection]:
        self.submit(images)
        return self.poll()
