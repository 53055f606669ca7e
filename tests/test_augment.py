"""On-device augmentation tests (component C4).

Compile budget matters on the 1-core CPU test host: each distinct
(cfg, shape) pair is jitted exactly once per module (cached fns below).
"""

import colorsys
import functools

import numpy as np
import jax
import jax.numpy as jnp

from shape_based_object_detection_tpu.config import DataConfig
from shape_based_object_detection_tpu.data import augment as A

_SIZE = 64
_FULL_CFG = DataConfig()
_IDENTITY_CFG = DataConfig(hflip=False, photometric=False, expand=False,
                           random_crop=False)
_FLIP_CFG = DataConfig(hflip=True, photometric=False, expand=False,
                       random_crop=False)


@functools.lru_cache(maxsize=None)
def _jitted(cfg: DataConfig):
    return jax.jit(
        lambda k, i, b, l, v: A.augment_batch(k, i, b, l, v, cfg, _SIZE)
    )


def test_hsv_roundtrip_matches_colorsys(rng):
    px = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    hsv = np.asarray(A.rgb_to_hsv(jnp.asarray(px)))
    for i in range(len(px)):
        h, s, v = colorsys.rgb_to_hsv(*px[i])
        np.testing.assert_allclose(hsv[i], [h, s, v], atol=1e-5)
    back = np.asarray(A.hsv_to_rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, px, atol=1e-5)


def _batch(rng, b=2, s=_SIZE, g=5):
    images = rng.integers(0, 255, size=(b, s, s, 3), dtype=np.uint8)
    cxcy = rng.uniform(0.3, 0.7, size=(b, g, 2))
    wh = rng.uniform(0.1, 0.2, size=(b, g, 2))
    boxes = np.concatenate([cxcy - wh / 2, cxcy + wh / 2], -1).astype(np.float32)
    labels = rng.integers(1, 4, size=(b, g)).astype(np.int32)
    valid = np.ones((b, g), bool)
    return images, boxes, labels, valid


def test_identity_config_is_resize_normalize(rng):
    images, boxes, labels, valid = _batch(rng)
    cfg = _IDENTITY_CFG
    img, bx, lb, vd = _jitted(cfg)(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(valid),
    )
    expected = (images.astype(np.float32) / 255.0 - np.asarray(cfg.mean)) / np.asarray(cfg.std)
    np.testing.assert_allclose(np.asarray(img), expected, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bx), boxes, atol=1e-6)
    assert np.asarray(vd).all()


def test_augment_shapes_and_validity(rng):
    images, boxes, labels, valid = _batch(rng, b=2, g=5)
    img, bx, lb, vd = _jitted(_FULL_CFG)(
        jax.random.PRNGKey(1), jnp.asarray(images), jnp.asarray(boxes),
        jnp.asarray(labels), jnp.asarray(valid))
    assert img.shape == (2, _SIZE, _SIZE, 3)
    assert bx.shape == (2, 5, 4)
    bxn = np.asarray(bx)
    vdn = np.asarray(vd)
    assert (bxn[vdn] >= -1e-6).all() and (bxn[vdn] <= 1 + 1e-6).all()
    assert ((bxn[vdn][:, 2:] - bxn[vdn][:, :2]) > 0).all()
    np.testing.assert_array_equal(np.asarray(lb), labels)
    assert np.isfinite(np.asarray(img)).all()


def test_augment_different_keys_differ(rng):
    images, boxes, labels, valid = _batch(rng)
    f = _jitted(_FULL_CFG)
    args = (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid))
    out1 = f(jax.random.PRNGKey(0), *args)
    out2 = f(jax.random.PRNGKey(7), *args)
    assert not np.allclose(np.asarray(out1[0]), np.asarray(out2[0]))


def test_hflip_box_math(rng):
    """Scan keys (one compiled fn) until one flips, then verify geometry."""
    images, boxes, labels, valid = _batch(rng, b=1, g=3)
    cfg = _FLIP_CFG
    f = _jitted(cfg)
    args = (jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(labels),
            jnp.asarray(valid))
    for seed in range(20):
        img, bx, lb, vd = f(jax.random.PRNGKey(seed), *args)
        if not np.allclose(np.asarray(bx), boxes):
            flipped = np.asarray(bx)[0]
            np.testing.assert_allclose(flipped[:, 0], 1.0 - boxes[0][:, 2], atol=1e-6)
            np.testing.assert_allclose(flipped[:, 2], 1.0 - boxes[0][:, 0], atol=1e-6)
            np.testing.assert_allclose(flipped[:, 1], boxes[0][:, 1], atol=1e-6)
            expected = (images[0, :, ::-1].astype(np.float32) / 255.0
                        - np.asarray(cfg.mean)) / np.asarray(cfg.std)
            np.testing.assert_allclose(np.asarray(img)[0], expected, atol=1e-4)
            return
    raise AssertionError("no flip observed in 20 keys (p < 1e-6)")


def test_augment_bfloat16_dtype_matches_f32(rng):
    """augment_dtype="bfloat16" (the bf16-model perf setting) produces the
    same geometry exactly (windows/boxes sampled in f32) and images close to
    the f32 pipeline."""
    import dataclasses

    import jax

    from shape_based_object_detection_tpu.config import DataConfig

    imgs = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    boxes = np.asarray([[[0.2, 0.2, 0.7, 0.8], [0.1, 0.4, 0.5, 0.9]]] * 2,
                       np.float32)
    labels = np.ones((2, 2), np.int32)
    valid = np.ones((2, 2), bool)
    cfg32 = DataConfig()
    cfg16 = dataclasses.replace(cfg32, augment_dtype="bfloat16")
    key = jax.random.PRNGKey(7)
    i32, b32, l32, v32 = A.augment_batch(key, imgs, boxes, labels, valid,
                                       cfg32, 64)
    i16, b16, l16, v16 = A.augment_batch(key, imgs, boxes, labels, valid,
                                       cfg16, 64)
    assert i16.dtype == jnp.bfloat16 and i32.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(v32), np.asarray(v16))
    np.testing.assert_allclose(np.asarray(b32), np.asarray(b16), atol=1e-6)
    # normalized-image values live in roughly [-2.5, 2.5]
    np.testing.assert_allclose(np.asarray(i16, np.float32),
                               np.asarray(i32), atol=0.12)


def test_crop_constraints_hold_in_window_space(rng):
    """When expand and crop BOTH fire, the IoU/center-inside crop
    constraints must be evaluated in the same (expanded-window) space the
    crop is applied in — so an image with valid GT always keeps at least
    one valid GT after augmentation (the chosen crop provably contains a
    GT center)."""
    imgs = rng.integers(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    boxes = np.asarray([[[0.3, 0.3, 0.6, 0.6], [0.5, 0.2, 0.9, 0.55]]],
                       np.float32)
    labels = np.ones((1, 2), np.int32)
    valid = np.ones((1, 2), bool)
    cfg = DataConfig()  # photometric+expand+crop+flip all on
    fn = jax.jit(functools.partial(A.augment_batch, cfg=cfg, out_size=64))
    survivors = []
    for seed in range(60):
        _, b, _, v = fn(jax.random.PRNGKey(seed), imgs, boxes, labels, valid)
        survivors.append(int(np.asarray(v).sum()))
        assert np.asarray(v).sum() >= 1, f"all GTs lost at seed {seed}"
    assert min(survivors) >= 1 and max(survivors) <= 2
