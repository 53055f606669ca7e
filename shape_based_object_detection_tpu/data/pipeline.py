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
    boxes: np.ndarray, labels: np.ndarray, max_boxes: int,
    flags: Optional[np.ndarray] = None,
):
    """(G, 4), (G,) -> fixed (max_boxes, ...) + validity mask.

    ``flags`` (G,) bool (e.g. crowd/ignore) pads alongside with the SAME
    truncation rule and comes back as a fourth array — the single source of
    truth for padding semantics."""
    g = min(len(boxes), max_boxes)
    out_boxes = np.zeros((max_boxes, 4), np.float32)
    out_labels = np.zeros((max_boxes,), np.int32)
    out_valid = np.zeros((max_boxes,), bool)
    if g:
        out_boxes[:g] = boxes[:g]
        out_labels[:g] = labels[:g]
        out_valid[:g] = True
    if flags is None:
        return out_boxes, out_labels, out_valid
    out_flags = np.zeros((max_boxes,), bool)
    if g:
        out_flags[:g] = np.asarray(flags, bool)[:g]
    return out_boxes, out_labels, out_valid, out_flags


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
        # every host must see the SAME number of samples (and thus dispatch
        # the same number of collective-bearing steps per epoch): truncate to
        # a multiple of num_hosts before striding
        idx = idx[: n - n % self.num_hosts]
        return idx[self.host_id :: self.num_hosts]

    def _sample(self, i):
        sample = self.dataset[int(i)]
        img, boxes, labels = sample[:3]
        # optional 4th element: per-box crowd/ignore flags (eval protocol)
        flags = (sample[3] if len(sample) > 3
                 else np.zeros(len(boxes), bool))
        b, l, v, cr = pad_annotations(boxes, labels, self.max_boxes,
                                      flags=flags)
        return img, b, l, v, cr

    def batches(self, epoch: int = 0) -> Iterator[DetectionBatch]:
        idx = self._epoch_indices(epoch)
        bs = self.batch_size
        if len(idx) < bs:
            # fail fast: yielding zero batches turns callers' epoch loops
            # into silent infinite spins
            raise ValueError(
                f"per-host shard has {len(idx)} samples < batch_size {bs}: "
                "shrink the batch or grow the dataset")
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

    def steps_per_epoch(self) -> int:
        """Full batches per epoch per host — the train loop's epoch length
        (used to derive the resume epoch from a restored step count)."""
        return len(self._epoch_indices(0)) // self.batch_size

    def batches_padded(self, epoch: int = 0):
        """Full-coverage iteration for EVAL: every sample of this host's
        shard appears exactly once — the ragged tail batch is padded to the
        static batch shape by repeating its last sample and yielded with its
        true row count. Yields ``(DetectionBatch, n_valid)``; consumers must
        ignore rows >= n_valid (``batches()`` instead DROPS the tail, which
        is correct for training but silently skews eval metrics)."""
        idx = self._epoch_indices(epoch)
        bs = self.batch_size
        for start in range(0, len(idx), bs):
            chunk = idx[start:start + bs]
            n_valid = len(chunk)
            if n_valid < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - n_valid)])
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
            ), n_valid

    def device_batches(
        self, epoch: int = 0, sharding: Optional["jax.sharding.Sharding"] = None
    ) -> Iterator[DetectionBatch]:
        """Background-thread prefetch: host prep overlaps device compute.

        Multi-process (a real pod), each process holds only its host's shard
        of the batch, so arrays are assembled with
        ``jax.make_array_from_process_local_data`` — a plain ``device_put``
        of a local array against a global sharding would reinterpret each
        host's shard as the whole global batch and silently drop
        (num_hosts-1)/num_hosts of every batch."""
        q: queue_lib.Queue = queue_lib.Queue(maxsize=self.prefetch)
        stop = object()
        cancel = threading.Event()
        error: list = []
        multiproc = sharding is not None and jax.process_count() > 1

        def transfer(x):
            if multiproc:
                return jax.make_array_from_process_local_data(
                    sharding, np.asarray(x))
            return jax.device_put(x, sharding)

        def put(item) -> bool:
            # bounded put that gives up when the consumer abandoned the
            # generator — otherwise this thread (and its prefetched
            # device-resident batches) would live until process exit
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue_lib.Full:
                    continue
            return False

        def producer():
            try:
                for batch in self.batches(epoch):
                    if cancel.is_set():
                        return
                    if not put(jax.tree_util.tree_map(transfer, batch)):
                        return
            except BaseException as e:  # surface in the consumer, never hang
                error.append(e)
            finally:
                put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    if error:
                        raise error[0]
                    break
                yield item
        finally:
            cancel.set()
            while True:  # release a producer blocked on a full queue
                try:
                    q.get_nowait()
                except queue_lib.Empty:
                    break
