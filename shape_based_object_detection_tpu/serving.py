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
from shape_based_object_detection_tpu.models.factory import build_model


@dataclasses.dataclass
class Detection:
    boxes: np.ndarray  # (K, 4) pixel xyxy in the original image frame
    scores: np.ndarray  # (K,)
    labels: np.ndarray  # (K,) 0-based foreground class ids


def prepare_batch(images: Sequence, size: int, batch_size: int,
                  letterbox: bool = False,
                  decode_backend: str = "auto") -> Tuple[np.ndarray, list]:
    """Resize (BILINEAR, the filter used across all serving paths) and
    zero-pad a request of <= batch_size images to the compiled batch shape.
    ``letterbox=True`` preserves aspect (pad bottom/right) instead of the
    square resize. Each item may be a decoded (H, W, 3) uint8 array, a file
    path, or encoded image bytes — path/bytes JPEGs take the fused native
    decode+resize (csrc/jpeg_decoder.cpp, DCT-domain prescale; the fast
    serving ingest) unless ``decode_backend='pil'`` (DataConfig semantics).
    An item may also be a PRE-RESIZED pair ``((S, S, 3) uint8, (h, w))`` —
    the caller already ran the decode+resize (e.g. the HTTP server does it
    on its request threads, in parallel) and supplies the original size for
    the box back-mapping. Returns (batch (B,S,S,3) uint8, original (h, w)
    sizes)."""
    from PIL import Image

    from shape_based_object_detection_tpu.utils.image import (
        letterbox_image_host, load_resized_image_host,
    )

    assert len(images) <= batch_size
    batch = np.zeros((batch_size, size, size, 3), np.uint8)
    sizes = []
    for i, img in enumerate(images):
        if isinstance(img, tuple):  # (pre-resized array, (h, w))
            resized, (h, w) = img
            resized = np.asarray(resized)
            # real raises (not asserts): survives python -O, and a float
            # array must not be silently value-truncated into uint8
            if resized.shape != (size, size, 3):
                raise ValueError(
                    f"pre-resized item has shape {resized.shape}, expected "
                    f"({size}, {size}, 3)")
            if resized.dtype != np.uint8:
                raise ValueError(
                    f"pre-resized item must be uint8, got {resized.dtype}")
            batch[i] = resized
            sizes.append((int(h), int(w)))
            continue
        if not isinstance(img, np.ndarray):
            batch[i], h, w = load_resized_image_host(
                img, size, letterbox, backend=decode_backend)
            sizes.append((h, w))
            continue
        h, w = img.shape[:2]
        sizes.append((h, w))
        if letterbox:
            batch[i] = letterbox_image_host(img, size)
        else:
            batch[i] = np.asarray(
                Image.fromarray(img).resize((size, size), Image.BILINEAR))
    return batch, sizes


def unpack_detections(det, sizes, min_score: float = 0.0,
                      letterbox: bool = False) -> List[Detection]:
    """Fixed-size device Detections -> per-image unpadded pixel-space lists.
    ``letterbox`` must match how the batch was prepared."""
    from shape_based_object_detection_tpu.utils.image import (
        boxes_norm_to_original_px,
    )

    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    labels = np.asarray(det.labels)
    valid = np.asarray(det.valid)
    out = []
    for i, (h, w) in enumerate(sizes):
        keep = valid[i] & (scores[i] >= min_score)
        bx = boxes_norm_to_original_px(boxes[i][keep], h, w, letterbox)
        out.append(Detection(boxes=bx, scores=scores[i][keep],
                             labels=labels[i][keep]))
    return out


def default_bucket_sizes(batch_size: int) -> list:
    """The standard bucket ladder: powers of 2 up to (and always including)
    ``batch_size`` — shared by serve_cli and the load-test tool."""
    return [b for b in (1, 2, 4, 8, 16, 32, 64)
            if b < batch_size] + [batch_size]


class Predictor:
    """detect() as a service: fixed batch, padded, async-dispatch friendly."""

    def __init__(self, cfg: ExperimentConfig, variables=None, batch_size: int = 8,
                 min_score: float = 0.0, quantize: bool | str = False,
                 activation_scales=None, bucket_sizes=None):
        """``quantize``: False | True/"weights" (int8 weight-only: ~4x
        smaller HBM weights, dequant on-chip) | "full" (additionally runs
        eligible convs as s8xs8->s32 on the MXU with dynamic activation
        scales — the high-throughput serving mode; quantize.py).
        ``activation_scales``: with quantize="full", a calibration dict from
        ``quantize.calibrate_activation_scales`` (or a path to its saved
        JSON) switches the int8 convs to static scales — removes the
        on-chip abs-max reductions (the measured batch-throughput serving
        champion; BASELINE.md).
        ``bucket_sizes``: optional batch-size buckets (e.g. (1, 4, 16)):
        each request chunk pads only to the smallest bucket >= its size
        instead of the full ``batch_size`` — small requests skip most of
        the padded batch's H2D transfer and compute (one compile per
        bucket; ``warmup()`` pre-compiles them all). None = the single
        compiled ``batch_size`` (fixed-shape default)."""
        self.cfg = cfg
        self.batch_size = batch_size
        if bucket_sizes is not None:
            bucket_sizes = sorted(set(int(b) for b in bucket_sizes))
            if not bucket_sizes or bucket_sizes[-1] != batch_size:
                raise ValueError(
                    f"bucket_sizes {bucket_sizes} must be non-empty and end "
                    f"at batch_size={batch_size}")
        self.bucket_sizes = bucket_sizes
        self.min_score = min_score
        self.size = cfg.model.image_size
        self.letterbox = cfg.data.letterbox
        from shape_based_object_detection_tpu.utils.image import (
            effective_decode_backend,
        )

        # resolved once ("native"/"pil"; "native" fails loud if the C lib
        # can't build) so serving honors DataConfig.decode_backend
        self.decode_backend = effective_decode_backend(
            cfg.data.decode_backend)
        module, init_vars, anchors = build_model(cfg.model)
        self.variables = variables if variables is not None else init_vars
        from shape_based_object_detection_tpu.quantize import (
            make_serving_detect,
        )

        self._detect, self.variables = make_serving_detect(
            module, anchors, cfg.model, cfg.data, self.variables, quantize,
            activation_scales=activation_scales)
        self._pending: List[Tuple] = []  # FIFO of in-flight dispatches

    def _bucket_for(self, n: int) -> int:
        """Smallest compiled batch that fits n requests."""
        if self.bucket_sizes is None:
            return self.batch_size
        for b in self.bucket_sizes:
            if n <= b:
                return b
        return self.batch_size

    def warmup(self) -> None:
        """Compile every bucket (and the default batch) up front, so the
        first real request at each size doesn't pay XLA compilation."""
        dummy = np.zeros((8, 8, 3), np.uint8)
        for b in (self.bucket_sizes or [self.batch_size]):
            self.submit([dummy] * b)
            self.poll()

    def submit(self, images: Sequence) -> None:
        """Dispatch a batch without blocking (device runs while host works).
        Multiple batches may be in flight; ``poll()`` returns them FIFO."""
        batch, sizes = prepare_batch(images, self.size,
                                     self._bucket_for(len(images)),
                                     self.letterbox, self.decode_backend)
        det = self._detect(self.variables, jnp.asarray(batch))  # async
        self._pending.append((det, sizes))

    def poll(self) -> List[Detection]:
        """Block on the OLDEST in-flight batch and return its unpadded
        detections (FIFO with submit)."""
        assert self._pending, "submit() a batch first"
        det, sizes = self._pending.pop(0)
        return unpack_detections(det, sizes, self.min_score, self.letterbox)

    def predict(self, images: Sequence) -> List[Detection]:
        """Any request size: runs ceil(len/batch_size) compiled batches,
        PIPELINED — chunk i+1's host prepare/dispatch happens before chunk
        i's blocking readback, so host prep overlaps device execution
        (submit-then-immediately-poll would serialize them).
        (submit/poll remain the <= batch_size single-dispatch surface.)"""
        out: List[Detection] = []
        pending: Optional[Tuple] = None
        for i in range(0, len(images), self.batch_size):
            chunk = images[i:i + self.batch_size]
            batch, sizes = prepare_batch(chunk, self.size,
                                         self._bucket_for(len(chunk)),
                                         self.letterbox,
                                         self.decode_backend)
            det = self._detect(self.variables, jnp.asarray(batch))  # async
            if pending is not None:
                out.extend(unpack_detections(*pending, self.min_score,
                                             self.letterbox))
            pending = (det, sizes)
        if pending is not None:
            out.extend(unpack_detections(*pending, self.min_score,
                                         self.letterbox))
        return out


class ArtifactPredictor:
    """The Predictor surface over an exported ``.sbdx`` artifact: identical
    host-side prepare/unpack, zero model-building Python (export.py)."""

    def __init__(self, artifact_path: str, min_score: float = 0.0):
        from shape_based_object_detection_tpu.export import load_artifact

        self._model = load_artifact(artifact_path)
        self.min_score = min_score
        self.size = self._model.header["image_size"]
        self.batch_size = self._model.header["batch_size"]
        self.letterbox = bool(self._model.header.get("letterbox", False))
        self.decode_backend = "auto"  # artifact headers predate the knob
        self._pending: List[Tuple] = []  # FIFO, mirrors Predictor

    def submit(self, images: Sequence) -> None:
        """Async dispatch (FIFO with poll) — the artifact has ONE compiled
        batch shape, so every submit pads to it (no buckets)."""
        batch, sizes = prepare_batch(images, self.size, self.batch_size,
                                     self.letterbox, self.decode_backend)
        self._pending.append((self._model(batch), sizes))

    def poll(self) -> List[Detection]:
        assert self._pending, "submit() a batch first"
        det, sizes = self._pending.pop(0)
        return unpack_detections(det, sizes, self.min_score, self.letterbox)

    def warmup(self) -> None:
        import numpy as np

        self.submit([np.zeros((8, 8, 3), np.uint8)])
        self.poll()

    def predict(self, images: Sequence) -> List[Detection]:
        # same prepare->dispatch->readback pipeline as Predictor.predict
        out: List[Detection] = []
        pending = None
        for i in range(0, len(images), self.batch_size):
            chunk = images[i:i + self.batch_size]
            batch, sizes = prepare_batch(chunk, self.size, self.batch_size,
                                         self.letterbox,
                                         self.decode_backend)
            det = self._model(batch)  # async dispatch
            if pending is not None:
                out.extend(unpack_detections(*pending, self.min_score,
                                             self.letterbox))
            pending = (det, sizes)
        if pending is not None:
            out.extend(unpack_detections(*pending, self.min_score,
                                         self.letterbox))
        return out
