"""fc->conv decimation surgery tests (component C21)."""

import numpy as np
import torch

from shape_based_object_detection_tpu.utils.vgg_surgery import (
    decimate, vgg_fc_to_ssd_convs, load_pretrained_vgg_into_flax,
)


def test_decimate():
    a = np.arange(12).reshape(4, 3)
    out = decimate(a, [2, None])
    np.testing.assert_array_equal(out, a[::2])
    out2 = decimate(a, [None, 3])
    np.testing.assert_array_equal(out2, a[:, ::3])


def test_fc_surgery_shapes_and_values(rng):
    fc6_w = rng.normal(size=(4096, 512 * 49)).astype(np.float32)
    fc6_b = rng.normal(size=(4096,)).astype(np.float32)
    fc7_w = rng.normal(size=(4096, 4096)).astype(np.float32)
    fc7_b = rng.normal(size=(4096,)).astype(np.float32)
    out = vgg_fc_to_ssd_convs(fc6_w, fc6_b, fc7_w, fc7_b)
    k6, b6 = out["conv6"]
    k7, b7 = out["conv7"]
    assert k6.shape == (3, 3, 512, 1024) and b6.shape == (1024,)
    assert k7.shape == (1, 1, 1024, 1024) and b7.shape == (1024,)
    # spot-check the decimation pattern: conv6 kernel[h,w,i,o] comes from
    # fc6[(4o), i, 3h, 3w]
    v6 = fc6_w.reshape(4096, 512, 7, 7)
    np.testing.assert_allclose(k6[1, 2, 10, 5], v6[20, 10, 3, 6])
    np.testing.assert_allclose(b6, fc6_b[::4])


def test_load_pretrained_vgg_into_flax(rng):
    """Full-width SSD params accept a synthetic torchvision-layout VGG16."""
    import jax
    from shape_based_object_detection_tpu import config as config_lib
    from shape_based_object_detection_tpu.models.ssd import SSD

    cfg = config_lib.SSD300
    module = SSD(cfg=cfg)
    variables = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0),
                            np.zeros((1, 300, 300, 3), np.float32)))
    # build a fake torchvision vgg16 state_dict (features.* + classifier.*)
    chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256), (256, 256),
             (256, 256), (256, 512), (512, 512), (512, 512), (512, 512),
             (512, 512), (512, 512)]
    layer_ids = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    g = np.random.default_rng(0)
    for lid, (ci, co) in zip(layer_ids, chans):
        sd[f"features.{lid}.weight"] = torch.from_numpy(
            g.normal(size=(co, ci, 3, 3)).astype(np.float32))
        sd[f"features.{lid}.bias"] = torch.from_numpy(
            g.normal(size=(co,)).astype(np.float32))
    sd["classifier.0.weight"] = torch.from_numpy(
        g.normal(size=(4096, 512 * 49)).astype(np.float32))
    sd["classifier.0.bias"] = torch.from_numpy(
        g.normal(size=(4096,)).astype(np.float32))
    sd["classifier.3.weight"] = torch.from_numpy(
        g.normal(size=(4096, 4096)).astype(np.float32))
    sd["classifier.3.bias"] = torch.from_numpy(
        g.normal(size=(4096,)).astype(np.float32))

    # eval_shape gives ShapeDtypeStructs; materialize zeros to merge into
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables)
    merged = load_pretrained_vgg_into_flax(sd, variables)
    k = np.asarray(merged["params"]["vgg"]["conv1_1"]["kernel"])
    np.testing.assert_allclose(
        k, np.transpose(sd["features.0.weight"].numpy(), (2, 3, 1, 0)))
    assert np.asarray(merged["params"]["vgg"]["conv6"]["kernel"]).shape == (
        3, 3, 512, 1024)


def test_features_only_checkpoint_raises():
    """A state_dict with no classifier.* keys must fail loud instead of
    silently leaving conv6/conv7 randomly initialized (review finding)."""
    import pytest
    from shape_based_object_detection_tpu.utils.vgg_surgery import (
        load_pretrained_vgg_into_flax)

    with pytest.raises(ValueError, match="classifier"):
        load_pretrained_vgg_into_flax({}, {"params": {"vgg": {}}})
