"""Wiring checks for every production model config via eval_shape (no
compile/execute — catches anchor/head mismatches across the whole zoo fast)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu.models.factory import build_module
from shape_based_object_detection_tpu.ops import anchors as anchor_lib


@pytest.mark.parametrize("model_cfg,expected_anchors", [
    (config_lib.SSD300, 8732),
    (config_lib.SSD512, 24564),
    (config_lib.RETINANET_R50_512, 49104),
    (config_lib.RETINANET_R101, None),
])
def test_model_head_matches_anchors(model_cfg, expected_anchors):
    module = build_module(model_cfg)
    anchors = anchor_lib.anchors_for_model(model_cfg)
    if expected_anchors is not None:
        assert anchors.shape[0] == expected_anchors

    s = model_cfg.image_size
    dummy = jnp.zeros((1, s, s, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), dummy))
    cls_shape, box_shape = jax.eval_shape(
        lambda v: module.apply(v, dummy), variables)
    assert cls_shape.shape[1] == anchors.shape[0]
    assert box_shape.shape == (1, anchors.shape[0], 4)
    k = model_cfg.num_classes + (1 if model_cfg.family == "ssd" else 0)
    assert cls_shape.shape[2] == k


def test_param_counts_sane():
    """Full-width param counts in the family's expected ranges."""
    module = build_module(config_lib.RETINANET_R50_512)
    dummy = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), dummy))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    assert 30e6 < n < 45e6, n  # RetinaNet-R50: ~34-38M

    module = build_module(config_lib.SSD300)
    dummy = jnp.zeros((1, 300, 300, 3), jnp.float32)
    variables = jax.eval_shape(lambda: module.init(jax.random.PRNGKey(0), dummy))
    n = sum(int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(variables["params"]))
    assert 20e6 < n < 40e6, n  # SSD300-VGG16: ~26M


def test_generic_ssd_feature_sizes_match_network():
    """Non-300/512 SSD sizes: the ssd_feature_sizes fallback must replay the
    real trunk/extras arithmetic (the old /16 heuristic disagreed with
    floor-mode pool4 at e.g. 600px — review finding). Verified against the
    actual module via eval_shape."""
    import dataclasses

    # 600: pool4 floors 75 -> 37 (the heuristic said ceil(600/16) = 38)
    assert anchor_lib.ssd_feature_sizes(600) == (75, 37, 19, 10, 8, 6)
    assert anchor_lib.ssd_feature_sizes(320) == (40, 20, 10, 5, 3, 1)
    # generic path reproduces the canonical constants' arithmetic
    for size, want in ((300, (38, 19, 10, 5, 3, 1)),
                       (512, (64, 32, 16, 8, 4, 2, 1))):
        got = anchor_lib.ssd_feature_sizes(size)
        assert got == want

    for size in (320, 600):
        cfg = dataclasses.replace(config_lib.SSD300, image_size=size)
        module = build_module(cfg)
        anchors = anchor_lib.anchors_for_model(cfg)
        dummy = jnp.zeros((1, size, size, 3), jnp.float32)
        variables = jax.eval_shape(
            lambda: module.init(jax.random.PRNGKey(0), dummy))
        cls_shape, _ = jax.eval_shape(
            lambda v: module.apply(v, dummy), variables)
        assert cls_shape.shape[1] == anchors.shape[0], size


def test_too_small_ssd_size_raises():
    with pytest.raises(ValueError, match="too small"):
        anchor_lib.ssd_feature_sizes(256)  # extras tail underflows
