"""Grain-based input pipeline variant (SURVEY.md §1 data layer).

The built-in ``pipeline.Loader`` is dependency-free; this adapter runs the
same indexable datasets through Google grain for production ingestion:
deterministic global shuffle, per-host sharding, worker prefetch — with the
same contract (padded DetectionBatch dicts ready for the jitted train step).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from shape_based_object_detection_tpu.data.pipeline import (
    DetectionBatch, pad_annotations,
)


def make_grain_iterator(
    dataset,  # indexable: (image_u8, boxes_norm, labels)
    batch_size: int,
    max_boxes: int,
    seed: int = 0,
    shuffle: bool = True,
    host_id: int = 0,
    num_hosts: int = 1,
    num_epochs: int | None = None,
    read_threads: int = 2,
) -> Iterator[DetectionBatch]:
    import grain.python as grain

    class _Source(grain.RandomAccessDataSource):
        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            img, boxes, labels = dataset[int(i)]
            b, l, v = pad_annotations(boxes, labels, max_boxes)
            return {"images": img, "boxes": b, "labels": l, "valid": v}

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
        data_source=_Source(),
        sampler=sampler,
        operations=[grain.Batch(batch_size, drop_remainder=True)],
        worker_count=0,  # in-process; raise for multi-worker hosts
        read_options=grain.ReadOptions(num_threads=read_threads,
                                       prefetch_buffer_size=batch_size * 2),
    )
    for batch in loader:
        yield DetectionBatch(
            images=np.asarray(batch["images"]),
            boxes=np.asarray(batch["boxes"]),
            labels=np.asarray(batch["labels"]),
            valid=np.asarray(batch["valid"]),
        )
