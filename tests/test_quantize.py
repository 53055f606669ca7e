"""int8 weight-only quantization (quantize.py): numerics, structure, and the
quantized serving/export surfaces."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import quantize as q_lib
from shape_based_object_detection_tpu.detection import make_detect_fn
from shape_based_object_detection_tpu.models.factory import build_model


@pytest.fixture(scope="module")
def tiny_cfg():
    return config_lib.get_config("tiny_retinanet")


@pytest.fixture(scope="module")
def built(tiny_cfg):
    return build_model(tiny_cfg.model)


def test_tensor_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)).astype(np.float32))
    qt = q_lib.quantize_tensor(w)
    assert qt.q.dtype == jnp.int8 and qt.q.shape == w.shape
    assert qt.scale.shape == (1, 1, 1, 32)
    # symmetric rounding: error <= scale/2 per output channel
    err = jnp.abs(qt.dequantize() - w)
    assert bool(jnp.all(err <= qt.scale / 2 + 1e-8))


def test_tensor_zero_channel_is_safe():
    w = jnp.zeros((4, 4, 8, 8), jnp.float32)
    qt = q_lib.quantize_tensor(w)
    out = qt.dequantize()
    assert bool(jnp.all(out == 0.0)) and bool(jnp.all(jnp.isfinite(qt.scale)))


def test_params_structure_only_large_kernels(built):
    _, variables, _ = built
    qvars = q_lib.quantize_params(variables, min_size=1024)

    def walk(path, leaf):
        name = getattr(path[-1], "key", None)
        if isinstance(leaf, q_lib.QTensor):
            assert name == "kernel" and leaf.q.size >= 1024
        elif name == "kernel":
            assert leaf.ndim < 2 or leaf.size < 1024
        return leaf

    jax.tree_util.tree_map_with_path(walk, qvars,
                                     is_leaf=lambda x: isinstance(
                                         x, q_lib.QTensor))
    n_q = sum(isinstance(x, q_lib.QTensor)
              for x in jax.tree_util.tree_leaves(
                  qvars, is_leaf=lambda x: isinstance(x, q_lib.QTensor)))
    assert n_q > 10  # most conv kernels in the tiny model qualify

    # footprint: quantized storage well under half the f32 storage
    f32_bytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(variables))
    assert q_lib.quantized_bytes(qvars) < 0.5 * f32_bytes


def test_quantized_forward_close_to_f32(built, tiny_cfg, rng):
    module, variables, _ = built
    qvars = q_lib.quantize_params(variables)
    size = tiny_cfg.model.image_size
    x = jnp.asarray(rng.normal(size=(1, size, size, 3)).astype(np.float32))

    cls_f, box_f = module.apply(variables, x)
    cls_q, box_q = module.apply(q_lib.dequantize_params(qvars), x)
    # int8 per-channel weight error is ~0.4% of channel amax; through a tiny
    # net the logit drift stays small
    assert float(jnp.max(jnp.abs(cls_q - cls_f))) < 0.2
    assert float(jnp.mean(jnp.abs(cls_q - cls_f))) < 0.02
    assert float(jnp.max(jnp.abs(box_q - box_f))) < 0.2


def test_quantized_detect_runs(built, tiny_cfg, rng):
    module, variables, anchors = built
    qvars = q_lib.quantize_params(variables)
    detect_q = q_lib.make_quantized_detect_fn(
        module, anchors, tiny_cfg.model, tiny_cfg.data, use_pallas=False)
    size = tiny_cfg.model.image_size
    images = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)
    det = detect_q(qvars, jnp.asarray(images))
    assert det.boxes.shape == (2, tiny_cfg.model.detect.max_detections, 4)
    assert det.valid.dtype == jnp.bool_


def test_quantized_export_smaller_and_runs(tiny_cfg, rng):
    from shape_based_object_detection_tpu import export as export_lib

    blob_f32 = export_lib.export_from_config(
        tiny_cfg, batch_size=1, platforms=("cpu",))
    blob_q = export_lib.export_from_config(
        tiny_cfg, batch_size=1, platforms=("cpu",), quantize=True)
    assert len(blob_q) < 0.5 * len(blob_f32)

    loaded = export_lib.load_detect(blob_q)
    assert loaded.header["quantized"] is True
    size = loaded.header["image_size"]
    det = loaded(rng.integers(0, 255, (1, size, size, 3)).astype(np.uint8))
    assert det.boxes.shape[0] == 1


def test_predictor_quantized(tiny_cfg, rng):
    from shape_based_object_detection_tpu.serving import Predictor

    pred = Predictor(tiny_cfg, batch_size=2, quantize=True)
    imgs = [rng.integers(0, 255, (97, 133, 3)).astype(np.uint8)]
    out = pred.predict(imgs)
    assert len(out) == 1
    assert out[0].boxes.shape[1] == 4


# ---------------------------------------------------------------------------
# Full int8 (activations + weights)
# ---------------------------------------------------------------------------


def test_int8_conv_interceptor_numerics(rng):
    """Intercepted conv matches float conv within dynamic-quant error and
    leaves lax.conv_general_dilated restored."""
    from flax import linen as nn
    from jax import lax

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.relu(nn.Conv(32, (3, 3), name="c1")(x))
            return nn.Conv(16, (3, 3), name="c2")(x)

    m = M()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 16, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)
    with nn.intercept_methods(q_lib.int8_conv_interceptor(min_size=1)):
        out = m.apply(v, x)
    # outside the interceptor scope the routing wrapper forwards to the true
    # conv: a plain re-apply is bit-identical to the pre-interceptor result
    assert bool(jnp.all(m.apply(v, x) == ref))
    assert lax.conv_general_dilated(  # direct call also unaffected (NCHW)
        jnp.ones((1, 1, 4, 4)), jnp.ones((1, 1, 2, 2)),
        window_strides=(1, 1), padding="VALID").dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref)))
    assert 0.0 < rel < 0.05  # quantized (not bit-equal) but close


def test_int8_skip_predicate_keeps_heads_float(rng):
    """Convs named predict/loc_*/cls_* bypass quantization bit-exactly."""
    from flax import linen as nn

    class H(nn.Module):
        @nn.compact
        def __call__(self, x):
            return (nn.Conv(8, (3, 3), name="predict")(x)
                    + nn.Conv(8, (3, 3), name="loc_0")(x))

    h = H()
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 4)).astype(np.float32))
    v = h.init(jax.random.PRNGKey(0), x)
    with nn.intercept_methods(q_lib.int8_conv_interceptor(min_size=1)):
        out = h.apply(v, x)
    assert bool(jnp.all(out == h.apply(v, x)))


def test_int8_activations_detect_close_and_runs(built, tiny_cfg, rng):
    """End-to-end int8-activation detect(): same program surface, logits
    drift bounded vs the weight-only path, detections well-formed."""
    module, variables, anchors = built
    qvars = q_lib.quantize_params(variables)
    size = tiny_cfg.model.image_size
    images = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)

    det_w = q_lib.make_quantized_detect_fn(
        module, anchors, tiny_cfg.model, tiny_cfg.data,
        use_pallas=False)(qvars, jnp.asarray(images))
    det_a = q_lib.make_quantized_detect_fn(
        module, anchors, tiny_cfg.model, tiny_cfg.data, use_pallas=False,
        int8_activations=True)(qvars, jnp.asarray(images))
    assert det_a.boxes.shape == det_w.boxes.shape
    assert bool(jnp.all(jnp.isfinite(det_a.scores)))
    # activation quantization perturbs but does not destroy the output
    # distribution: compare the mean top-score per image
    top_w = jnp.max(jnp.where(det_w.valid, det_w.scores, 0.0), axis=1)
    top_a = jnp.max(jnp.where(det_a.valid, det_a.scores, 0.0), axis=1)
    assert float(jnp.max(jnp.abs(top_w - top_a))) < 0.05


def test_int8_activations_export_runs(tiny_cfg, rng):
    from shape_based_object_detection_tpu import export as export_lib

    blob = export_lib.export_from_config(
        tiny_cfg, batch_size=1, platforms=("cpu",), quantize=True,
        int8_activations=True)
    loaded = export_lib.load_detect(blob)
    assert loaded.header["int8_activations"] is True
    size = loaded.header["image_size"]
    det = loaded(rng.integers(0, 255, (1, size, size, 3)).astype(np.uint8))
    assert det.boxes.shape[0] == 1
    assert bool(np.all(np.isfinite(np.asarray(det.scores))))


def test_predictor_full_int8(tiny_cfg, rng):
    from shape_based_object_detection_tpu.serving import Predictor

    pred = Predictor(tiny_cfg, batch_size=2, quantize="full")
    imgs = [rng.integers(0, 255, (97, 133, 3)).astype(np.uint8)]
    out = pred.predict(imgs)
    assert len(out) == 1 and out[0].boxes.shape[1] == 4


def test_int8_activation_scale_is_per_image(rng):
    """Dynamic activation scales reduce per batch element, so an image's
    int8 detections are independent of what it is co-batched with (serving
    reproducibility across request mixes / zero-padding)."""
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), name="c")(x)

    m = M()
    a = rng.uniform(-1, 1, (1, 8, 8, 4)).astype(np.float32)
    big = 100.0 * rng.uniform(-1, 1, (1, 8, 8, 4)).astype(np.float32)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(a))
    icpt = q_lib.int8_conv_interceptor(min_size=1)
    with nn.intercept_methods(icpt):
        alone = m.apply(v, jnp.asarray(np.concatenate([a, np.zeros_like(a)])))
        mixed = m.apply(v, jnp.asarray(np.concatenate([a, big])))
    np.testing.assert_array_equal(np.asarray(alone[0]), np.asarray(mixed[0]))


def test_quantize_mode_validation(tiny_cfg):
    """Misspelled quantize modes raise instead of silently serving a
    different tier."""
    import pytest

    from shape_based_object_detection_tpu.serving import Predictor

    with pytest.raises(ValueError, match="unknown quantize mode"):
        Predictor(tiny_cfg, batch_size=1, quantize="Full")
    assert q_lib.normalize_quantize_mode(True) == "weights"
    assert q_lib.normalize_quantize_mode("full") == "full"
    assert q_lib.normalize_quantize_mode(False) == ""


def test_routing_conv_does_not_patch_jax_lax():
    """Installing the int8 routing hook must scope to flax's conv call site
    (a proxy on flax.linen.linear.lax) — assigning through the module
    binding would monkey-patch jax.lax.conv_general_dilated process-wide
    (review finding)."""
    import jax.lax as real_lax

    from shape_based_object_detection_tpu import quantize as q

    before = real_lax.conv_general_dilated
    q._install_routing_conv()
    assert real_lax.conv_general_dilated is before
    # flax's call site IS routed
    from flax.linen import linear as fl

    assert fl.lax.conv_general_dilated is not before
    # and non-conv attributes still forward to the real module
    assert fl.lax.dot_general is real_lax.dot_general


# ---------------------------------------------------------------------------
# Static-calibration int8 (PTQ: calibrated activation scales)
# ---------------------------------------------------------------------------


def test_calibrate_returns_scales(built, tiny_cfg, rng):
    module, variables, _ = built
    size = tiny_cfg.model.image_size
    batches = [rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)
               for _ in range(2)]
    amaxes = q_lib.calibrate_activation_scales(
        module, variables, batches, tiny_cfg.data)
    assert amaxes and all(isinstance(k, str) for k in amaxes)
    assert all(np.isfinite(v) and v > 0 for v in amaxes.values())
    # reduced over batches: calibrating on a subset never exceeds the union
    sub = q_lib.calibrate_activation_scales(
        module, variables, batches[:1], tiny_cfg.data)
    assert sub.keys() == amaxes.keys()
    assert all(sub[k] <= amaxes[k] + 1e-6 for k in sub)


def test_static_single_conv_matches_dynamic_bitexact(rng):
    """At batch 1, a dynamic per-image scale IS the input's abs-max — so a
    static scale calibrated on that exact input must reproduce the dynamic
    path bit-exactly (the strongest cross-check of the static impl)."""
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), name="c")(x)

    m = M()
    x = jnp.asarray(rng.uniform(-2, 2, (1, 8, 8, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    amax = float(jnp.max(jnp.abs(x)))
    with nn.intercept_methods(q_lib.int8_conv_interceptor(min_size=1)):
        dyn = m.apply(v, x)
    with nn.intercept_methods(q_lib.int8_conv_interceptor(
            min_size=1, activation_scales={"c": amax})):
        sta = m.apply(v, x)
    np.testing.assert_array_equal(np.asarray(dyn), np.asarray(sta))


def test_static_missing_scale_raises(rng):
    from flax import linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(8, (3, 3), name="c")(x)

    m = M()
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 8, 4)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    with pytest.raises(ValueError, match="no calibrated activation scale"):
        with nn.intercept_methods(q_lib.int8_conv_interceptor(
                min_size=1, activation_scales={"other": 1.0})):
            m.apply(v, x)


def test_static_detect_close_and_runs(built, tiny_cfg, rng):
    """End-to-end static-int8 detect(): calibrate on the serving input, run
    the static tier, drift bounded vs the weight-only path."""
    module, variables, anchors = built
    qvars = q_lib.quantize_params(variables)
    size = tiny_cfg.model.image_size
    images = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)
    scales = q_lib.calibrate_activation_scales(
        module, variables, [images], tiny_cfg.data)

    det_w = q_lib.make_quantized_detect_fn(
        module, anchors, tiny_cfg.model, tiny_cfg.data,
        use_pallas=False)(qvars, jnp.asarray(images))
    det_s = q_lib.make_quantized_detect_fn(
        module, anchors, tiny_cfg.model, tiny_cfg.data, use_pallas=False,
        int8_activations=True, activation_scales=scales)(
            qvars, jnp.asarray(images))
    assert det_s.boxes.shape == det_w.boxes.shape
    assert bool(jnp.all(jnp.isfinite(det_s.scores)))
    top_w = jnp.max(jnp.where(det_w.valid, det_w.scores, 0.0), axis=1)
    top_s = jnp.max(jnp.where(det_s.valid, det_s.scores, 0.0), axis=1)
    assert float(jnp.max(jnp.abs(top_w - top_s))) < 0.05


def test_static_scales_json_roundtrip_and_predictor(tmp_path, built,
                                                    tiny_cfg, rng):
    from shape_based_object_detection_tpu.serving import Predictor

    module, variables, _ = built
    size = tiny_cfg.model.image_size
    batch = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)
    scales = q_lib.calibrate_activation_scales(
        module, variables, [batch], tiny_cfg.data)
    path = str(tmp_path / "scales.json")
    q_lib.save_activation_scales(path, scales)
    assert q_lib.load_activation_scales(path) == pytest.approx(scales)

    pred = Predictor(tiny_cfg, batch_size=2, quantize="full",
                     activation_scales=path)
    out = pred.predict([rng.integers(0, 255, (97, 133, 3)).astype(np.uint8)])
    assert len(out) == 1 and out[0].boxes.shape[1] == 4


def test_static_scales_require_full_mode(built, tiny_cfg):
    module, variables, anchors = built
    with pytest.raises(ValueError, match="only applies to quantize mode"):
        q_lib.make_serving_detect(module, anchors, tiny_cfg.model,
                                  tiny_cfg.data, variables, "weights",
                                  activation_scales={"c": 1.0})


def test_static_export_header_and_runs(built, tiny_cfg, rng):
    from shape_based_object_detection_tpu import export as export_lib

    module, variables, _ = built
    size = tiny_cfg.model.image_size
    batch = rng.integers(0, 255, (1, size, size, 3)).astype(np.uint8)
    scales = q_lib.calibrate_activation_scales(
        module, variables, [batch], tiny_cfg.data)
    blob = export_lib.export_from_config(
        tiny_cfg, batch_size=1, platforms=("cpu",), quantize=True,
        int8_activations=True, activation_scales=scales)
    loaded = export_lib.load_detect(blob)
    assert loaded.header["activation_scale_mode"] == "static"
    det = loaded(batch)
    assert bool(np.all(np.isfinite(np.asarray(det.scores))))


def test_calibrate_no_batches_is_diagnosed(built, tiny_cfg):
    """An empty batch feed is reported as such, not as 'no eligible convs'
    (a dataset smaller than the batch size yields zero full batches)."""
    module, variables, _ = built
    with pytest.raises(ValueError, match="no batches"):
        q_lib.calibrate_activation_scales(module, variables, [],
                                          tiny_cfg.data)
