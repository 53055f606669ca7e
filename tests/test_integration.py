"""End-to-end integration (SURVEY.md §4 item 5): overfit a tiny model on
synthetic images, then verify detect() recovers the boxes and the first-party
mAP agrees."""

import pytest

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import train as train_lib
from shape_based_object_detection_tpu.data.pipeline import Loader
from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
from shape_based_object_detection_tpu.eval import Evaluator
from shape_based_object_detection_tpu.models.factory import build_model

pytestmark = pytest.mark.slow  # compile-heavy; deselect with -m "not slow"


def test_overfit_then_detect():
    cfg = config_lib.get_config("tiny_retinanet")
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, batch_size=2, max_boxes=8,
                                 photometric=False, expand=False,
                                 random_crop=False, hflip=False),
        train=dataclasses.replace(cfg.train, base_lr=0.02, warmup_steps=10),
        model=dataclasses.replace(
            cfg.model,
            detect=dataclasses.replace(cfg.model.detect, score_threshold=0.3,
                                       max_detections=20),
        ),
    )
    module, variables, anchors = build_model(cfg.model)
    state = train_lib.create_train_state(module, variables, cfg)
    step_fn = train_lib.make_train_step(module, anchors, cfg, augment=False)

    ds = SyntheticDetection(size=cfg.model.image_size, num_images=2,
                            num_classes=cfg.model.num_classes, max_objects=2)
    loader = Loader(ds, batch_size=2, max_boxes=cfg.data.max_boxes,
                    shuffle=False)
    batch = next(iter(loader.batches()))._asdict()

    losses = []
    for _ in range(150):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[5] * 0.2, f"not overfitting: {losses[5]} -> {losses[-1]}"

    eval_fn = train_lib.make_eval_step(module, anchors, cfg)
    det = eval_fn(state, jnp.asarray(batch["images"]))

    ev = Evaluator()
    ev.add_batch(det, batch["boxes"], batch["labels"] - 1, batch["valid"])
    # detect() labels are 0-based foreground; GT labels are 1-based -> shifted
    metrics = ev.voc(iou_threshold=0.4)
    assert metrics["mAP"] > 0.4, f"overfit model failed to localize: {metrics}"
