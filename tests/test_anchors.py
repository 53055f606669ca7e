"""Anchor generation tests (component C11): counts, layout, validity."""

import numpy as np

from shape_based_object_detection_tpu import config
from shape_based_object_detection_tpu.ops import anchors as A


def test_ssd300_prior_count():
    pri = np.asarray(A.ssd_anchors(config.SSD300_ANCHORS, 300))
    assert pri.shape == (8732, 4)  # Liu et al. 2016 SSD-300 canonical count


def test_ssd512_prior_count():
    pri = np.asarray(A.ssd_anchors(config.SSD512_ANCHORS, 512))
    assert pri.shape == (24564, 4)  # SSD-512 canonical count


def test_ssd_priors_valid():
    pri = np.asarray(A.ssd_anchors(config.SSD300_ANCHORS, 300))
    # centers in (0,1); sizes positive and clamped <= 1
    assert (pri[:, :2] > 0).all() and (pri[:, :2] < 1).all()
    assert (pri[:, 2:] > 0).all() and (pri[:, 2:] <= 1.0).all()


def test_ssd_feature_sizes():
    assert A.ssd_feature_sizes(300) == (38, 19, 10, 5, 3, 1)
    assert A.ssd_feature_sizes(512) == (64, 32, 16, 8, 4, 2, 1)


def test_retinanet_anchor_count_512():
    pri = np.asarray(A.retinanet_anchors(config.RETINANET_ANCHORS, 512))
    fmaps = A.retinanet_feature_sizes(512, config.RETINANET_ANCHORS.strides)
    assert fmaps == (64, 32, 16, 8, 4)
    expected = sum(f * f * 9 for f in fmaps)
    assert pri.shape == (expected, 4)


def test_retinanet_anchor_geometry():
    cfg = config.RETINANET_ANCHORS
    pri = np.asarray(A.retinanet_anchors(cfg, 512))
    # First cell of P3: center at (0.5*8/512); first anchor is octave 1.0,
    # ratio 0.5 -> w = 32*sqrt(0.5), h = 32/sqrt(0.5) (normalized by 512).
    np.testing.assert_allclose(pri[0, :2], 4.0 / 512, atol=1e-7)
    np.testing.assert_allclose(pri[0, 2], 32 * np.sqrt(0.5) / 512, rtol=1e-6)
    np.testing.assert_allclose(pri[0, 3], 32 / np.sqrt(0.5) / 512, rtol=1e-6)
    # 9 anchors per cell share the same center
    np.testing.assert_allclose(pri[:9, :2], np.tile(pri[0, :2], (9, 1)), atol=1e-7)


def test_anchors_for_model_dispatch():
    m1 = config.SSD300
    m2 = config.RETINANET_R50_512
    assert A.anchors_for_model(m1).shape[0] == 8732
    assert A.anchors_for_model(m2).shape[1] == 4
