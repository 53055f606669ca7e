"""Batching and host->device feeding (component C5, SURVEY.md §2).

The reference collates variable-#GT images into Python lists of tensors; XLA
needs static shapes, so every image's annotations are padded to
``DataConfig.max_boxes`` with a validity mask, and images are pre-resized on
the host (decode + one resize = the only host work) to the model's static
input size. A tiny double-buffered loader overlaps host prep with device
compute via ``jax.device_put`` prefetch.
"""

from __future__ import annotations

import threading
import queue as queue_lib
from typing import Callable, Iterator, NamedTuple, Optional, Sequence

import numpy as np

import jax


class DetectionBatch(NamedTuple):
    images: np.ndarray  # (B, S, S, 3) uint8
    boxes: np.ndarray  # (B, G, 4) float32, normalized xyxy
    labels: np.ndarray  # (B, G) int32, 1-based foreground classes
    valid: np.ndarray  # (B, G) bool
    # (B, G) bool: crowd/ignore GT regions (eval protocol; all-False unless
    # the dataset yields crowd flags, e.g. CocoDetection(include_crowd=True))
    crowd: Optional[np.ndarray] = None


def pad_annotations(
    boxes: np.ndarray, labels: np.ndarray, max_boxes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(G, 4), (G,) -> fixed (max_boxes, ...) + validity mask."""
    g = min(len(boxes), max_boxes)
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_labels = np.zeros((max_boxes,), np.int32)
    out_valid = np.zeros((max_boxes,), bool)
    if g:
        out_boxes[:g] = boxes[:g]
        out_labels[:g] = labels[:g]
        out_valid[:g] = True
    return out_boxes, out_labels, out_valid


class Loader:
    """Minimal epoch loader over an indexable dataset of
    (image_u8 (S,S,3), boxes (G,4) normalized, labels (G,)) samples.

    Shuffles per epoch, pads annotations, drops the ragged tail batch (static
    shapes), shards by host for multi-host DP, and prefetches to device.

    ``workers > 1`` fetches the samples of a batch through a thread pool —
    the analog of the reference's ``DataLoader(num_workers=N)``. Threads (not
    processes) suffice here because the per-sample work (JPEG decode via
    PIL/libjpeg, large numpy slicing) releases the GIL.
    """

    def __init__(
        self,
        dataset,  # supports __len__ / __getitem__
        batch_size: int,
        max_boxes: int,
        seed: int = 0,
        shuffle: bool = True,
        host_id: int = 0,
        num_hosts: int = 1,
        prefetch: int = 2,
        workers: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.seed = seed
        self.shuffle = shuffle
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        if workers > 1:
            import weakref
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=workers)
            # release worker threads when the Loader is garbage-collected or
            # close()d — never hold them to interpreter exit
            self._finalizer = weakref.finalize(
                self, self._pool.shutdown, False)
        else:
            self._pool = None
            self._finalizer = None

    def close(self) -> None:
        """Shut down worker threads (also runs on garbage collection)."""
        if self._finalizer is not None:
            self._finalizer()

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            # identical permutation on every host, then shard (multi-host DP)
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        return idx[self.host_id :: self.num_hosts]

    def _sample(self, i):
        sample = self.dataset[int(i)]
        img, boxes, labels = sample[:3]
        b, l, v = pad_annotations(boxes, labels, self.max_boxes)
        if len(sample) > 3:  # optional per-box crowd flags (eval protocol)
            cr = np.zeros((self.max_boxes,), bool)
            g = min(len(sample[3]), self.max_boxes)
            cr[:g] = np.asarray(sample[3], bool)[:g]
        else:
            cr = np.zeros((self.max_boxes,), bool)
        return img, b, l, v, cr

    def batches(self, epoch: int = 0) -> Iterator[DetectionBatch]:
        idx = self._epoch_indices(epoch)
        bs = self.batch_size
        for start in range(0, len(idx) - bs + 1, bs):
            chunk = idx[start : start + bs]
            if self._pool is not None:
                samples = list(self._pool.map(self._sample, chunk))
            else:
                samples = [self._sample(i) for i in chunk]
            imgs, bxs, lbs, vds, crs = zip(*samples)
            yield DetectionBatch(
                images=np.stack(imgs),
                boxes=np.stack(bxs),
                labels=np.stack(lbs),
                valid=np.stack(vds),
                crowd=np.stack(crs),
            )

    def device_batches(
        self, epoch: int = 0, sharding: Optional["jax.sharding.Sharding"] = None
    ) -> Iterator[DetectionBatch]:
        """Background-thread prefetch: host prep overlaps device compute."""
        q: queue_lib.Queue = queue_lib.Queue(maxsize=self.prefetch)
        stop = object()
        error: list = []

        def producer():
            try:
                for batch in self.batches(epoch):
                    arrays = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, sharding), batch
                    )
                    q.put(arrays)
            except BaseException as e:  # surface in the consumer, never hang
                error.append(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                if error:
                    raise error[0]
                break
            yield item
