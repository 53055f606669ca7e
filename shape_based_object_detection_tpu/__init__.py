"""TPU-native single-stage object detection framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of
``shuaiqi361/shape_based_object_detection`` (SSD-300/512 on VGG-16, RetinaNet on
ResNet-50/101 + FPN, IoU + shape-similarity anchor matching, focal/multibox losses
with hard-negative mining, batched class-aware NMS, COCO/VOC training and eval).

Note on citations: the reference repo mount was empty during this build
(see SURVEY.md §0), so behavioral contracts are cited against BASELINE.json's
north-star specification and the SSD/RetinaNet family papers rather than
reference file:line.

Public API (mirrors the reference per BASELINE.json:6):
  - ``build_model(cfg)`` / ``build_model("ssd300")`` — model construction
  - ``detect(params, images, ...)`` — jitted end-to-end inference
  - ``train_step(state, batch)`` — jitted, donated training step
"""

from shape_based_object_detection_tpu import config
from shape_based_object_detection_tpu.config import (
    ModelConfig,
    TrainConfig,
    DataConfig,
    DetectConfig,
    ExperimentConfig,
    get_config,
    PRESETS,
)
from shape_based_object_detection_tpu.models.factory import build_model
from shape_based_object_detection_tpu import ops
from shape_based_object_detection_tpu import losses
from shape_based_object_detection_tpu import train
from shape_based_object_detection_tpu.train import TrainState, make_train_step

__version__ = "0.1.0"

__all__ = [
    "config",
    "ModelConfig",
    "TrainConfig",
    "DataConfig",
    "DetectConfig",
    "ExperimentConfig",
    "get_config",
    "PRESETS",
    "build_model",
    "ops",
    "losses",
    "train",
    "TrainState",
    "make_train_step",
]
