"""Input pipeline: host decode only; augmentation and batching are on-device
jitted jnp (components C2-C5, SURVEY.md §2)."""

from shape_based_object_detection_tpu.data import augment
from shape_based_object_detection_tpu.data import synthetic
from shape_based_object_detection_tpu.data import voc
from shape_based_object_detection_tpu.data import coco
from shape_based_object_detection_tpu.data.augment import augment_batch
from shape_based_object_detection_tpu.data.pipeline import (
    DetectionBatch,
    pad_annotations,
    Loader,
)
