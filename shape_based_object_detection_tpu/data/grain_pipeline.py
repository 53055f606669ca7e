"""Grain-based input pipeline variant (SURVEY.md §1 data layer).

The built-in ``pipeline.Loader`` is dependency-free; this adapter runs the
same indexable datasets through Google grain for production ingestion:
deterministic global shuffle, per-host sharding, multi-PROCESS workers
(``worker_count > 0`` — JPEG decode off the training process entirely),
prefetch — with the same contract (padded DetectionBatch, ready for the
jitted train step). The source/transform classes are module-level so grain
can pickle them into worker processes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from shape_based_object_detection_tpu.data.pipeline import (
    DetectionBatch, pad_annotations,
)


class PaddedDetectionSource:
    """Picklable grain RandomAccessDataSource over an indexable dataset of
    (image_u8, boxes_norm, labels[, crowd]) samples, padding to max_boxes."""

    def __init__(self, dataset, max_boxes: int):
        self.dataset = dataset
        self.max_boxes = max_boxes

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        sample = self.dataset[int(i)]
        img, boxes, labels = sample[:3]
        flags = (np.asarray(sample[3], bool) if len(sample) > 3
                 else np.zeros(len(boxes), bool))
        b, l, v, cr = pad_annotations(boxes, labels, self.max_boxes,
                                      flags=flags)
        return {"images": img, "boxes": b, "labels": l, "valid": v,
                "crowd": cr}


def make_grain_iterator(
    dataset,  # indexable: (image_u8, boxes_norm, labels[, crowd])
    batch_size: int,
    max_boxes: int,
    seed: int = 0,
    shuffle: bool = True,
    host_id: int = 0,
    num_hosts: int = 1,
    num_epochs: int | None = None,
    read_threads: int = 2,
    worker_count: int = 0,
) -> Iterator[DetectionBatch]:
    """``worker_count > 0`` forks that many grain worker processes — the
    per-sample decode/resize runs outside the training process (the
    reference's DataLoader(num_workers=N) analog at process granularity)."""
    import grain.python as grain

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.ShardOptions(
            shard_index=host_id, shard_count=num_hosts, drop_remainder=True
        ),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    loader = grain.DataLoader(
        data_source=PaddedDetectionSource(dataset, max_boxes),
        sampler=sampler,
        operations=[grain.Batch(batch_size, drop_remainder=True)],
        worker_count=worker_count,
        read_options=grain.ReadOptions(num_threads=read_threads,
                                       prefetch_buffer_size=batch_size * 2),
    )
    for batch in loader:
        yield DetectionBatch(
            images=np.asarray(batch["images"]),
            boxes=np.asarray(batch["boxes"]),
            labels=np.asarray(batch["labels"]),
            valid=np.asarray(batch["valid"]),
            crowd=np.asarray(batch["crowd"]),
        )


class GrainLoader:
    """pipeline.Loader-compatible facade over grain (batches/device_batches),
    for `train_cli --loader grain --workers N`.

    One persistent grain DataLoader/iterator serves every epoch — worker
    processes spin up ONCE (spinning them up per epoch costs tens of
    seconds and starves the device); grain's sampler reshuffles across its
    internal epochs. ``batches(epoch)`` yields one epoch's worth of batches
    from the shared stream."""

    def __init__(self, dataset, batch_size: int, max_boxes: int,
                 seed: int = 0, shuffle: bool = True, host_id: int = 0,
                 num_hosts: int = 1, workers: int = 0, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_boxes = max_boxes
        self.seed = seed
        self.shuffle = shuffle
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.worker_count = workers
        self.prefetch = prefetch
        self._stream = None

    def _ensure_stream(self):
        if self._stream is None:
            self._stream = iter(make_grain_iterator(
                self.dataset, self.batch_size, self.max_boxes,
                seed=self.seed, shuffle=self.shuffle,
                host_id=self.host_id, num_hosts=self.num_hosts,
                num_epochs=None,  # endless: epochs are consumed in slices
                worker_count=self.worker_count,
            ))
        return self._stream

    def steps_per_epoch(self) -> int:
        """Full batches per epoch per host (Loader-facade parity; used by
        the train loop to derive the resume epoch)."""
        return (len(self.dataset) // self.num_hosts) // self.batch_size

    def batches(self, epoch: int = 0):
        del epoch  # grain's sampler owns the shuffle schedule
        stream = self._ensure_stream()
        n = (len(self.dataset) // self.num_hosts) // self.batch_size
        if n == 0:
            # same fail-fast as pipeline.Loader.batches: a max(1, n) pull
            # here would silently fill one batch by wrapping into grain's
            # next sampler epoch (duplicated samples, desynced epochs)
            raise ValueError(
                f"per-host shard has {len(self.dataset) // self.num_hosts} "
                f"samples < batch_size {self.batch_size}: shrink the batch "
                "or grow the dataset")
        for _ in range(n):
            yield next(stream)

    # reuse the double-buffered device prefetch from the plain Loader
    # (it only touches self.batches/self.prefetch)
    from shape_based_object_detection_tpu.data.pipeline import (
        Loader as _Loader,
    )

    device_batches = _Loader.device_batches

    def close(self) -> None:
        stream, self._stream = self._stream, None
        if stream is not None:
            # The generator holds the grain DataLoader (and its worker
            # processes / shared-memory blocks); .close() unwinds it so
            # grain tears them down instead of leaking at interpreter exit.
            stream.close()
            import gc

            gc.collect()
