"""Tests for the first-party fused JPEG decode+resize (csrc/jpeg_decoder.cpp
via utils/native.py) and its PIL-fallback wrapper
utils/image.py::load_resized_image_host.

The native path decodes at a DCT-domain prescale, so pixels differ slightly
from PIL's full-decode-then-resize — tests assert closeness, not equality.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from shape_based_object_detection_tpu.utils.image import (
    effective_decode_backend,
    letterbox_image_host,
    load_resized_image_host,
)
from shape_based_object_detection_tpu.utils.native import (
    decode_jpeg_resize_native,
    load_image_lib,
)


def _photo(h=400, w=600, seed=0):
    """Photo-like uint8 image: smooth gradients + mild noise."""
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([
        (x * 0.3) % 256, (y * 0.5) % 256, ((x + y) * 0.2) % 256,
    ], -1).astype(np.int32)
    img = np.clip(img + rng.integers(-15, 15, img.shape), 0, 255)
    return img.astype(np.uint8)


def _jpeg_bytes(img, quality=92):
    b = io.BytesIO()
    Image.fromarray(img).save(b, "JPEG", quality=quality)
    return b.getvalue()


needs_native = pytest.mark.skipif(
    load_image_lib() is None, reason="csrc/jpeg_decoder.cpp did not build")


@needs_native
def test_native_square_matches_pil():
    data = _jpeg_bytes(_photo())
    out, h, w = decode_jpeg_resize_native(data, 128, False)
    assert (out.shape, out.dtype) == ((128, 128, 3), np.uint8)
    assert (h, w) == (400, 600)
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (128, 128), Image.BILINEAR), np.uint8)
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    # DCT prescale (here 3/8) vs full decode: close but not bit-equal
    assert d.mean() < 3.0 and np.percentile(d, 99) <= 12, (
        d.mean(), np.percentile(d, 99))


@needs_native
def test_native_letterbox_matches_pil_and_pads_zero():
    img = _photo(300, 500, seed=1)
    data = _jpeg_bytes(img)
    out, h, w = decode_jpeg_resize_native(data, 128, True)
    assert (h, w) == (300, 500)
    full = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)
    ref = letterbox_image_host(full, 128)
    # content rows: round(300 * 128/500) = 77
    nh = round(300 * 128 / 500)
    assert (out[nh:] == 0).all(), "bottom padding must be zero"
    d = np.abs(out[:nh].astype(np.int32) - ref[:nh].astype(np.int32))
    assert d.mean() < 3.0, d.mean()


@needs_native
def test_native_no_prescale_is_near_exact():
    # 140x145 -> 128 forces scale_num=8 (7/8 would give 122 rows < 128, so
    # full decode); the only difference from PIL is the resample arithmetic
    # (float vs PIL's 8-bit fixed-point coefficients, a few LSB on noise)
    data = _jpeg_bytes(_photo(140, 145, seed=2))
    out, _, _ = decode_jpeg_resize_native(data, 128, False)
    ref = np.asarray(
        Image.open(io.BytesIO(data)).convert("RGB").resize(
            (128, 128), Image.BILINEAR), np.uint8)
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert d.mean() < 1.0 and d.max() <= 8, (d.mean(), d.max())


@needs_native
def test_native_upscale_and_tiny_images():
    # target larger than source: triangle filter degenerates to bilinear
    data = _jpeg_bytes(_photo(40, 30, seed=3))
    out, h, w = decode_jpeg_resize_native(data, 96, False)
    assert out.shape == (96, 96, 3) and (h, w) == (40, 30)
    # extreme aspect ratio letterbox: short side stays >= 1 px
    data = _jpeg_bytes(_photo(8, 600, seed=4))
    out, _, _ = decode_jpeg_resize_native(data, 64, True)
    assert out.shape == (64, 64, 3)
    assert (out[2:] == 0).all()  # round(8 * 64/600) = 1 content row


@needs_native
def test_native_grayscale_jpeg():
    img = _photo(200, 200, seed=5)[:, :, 0]
    b = io.BytesIO()
    Image.fromarray(img, "L").save(b, "JPEG", quality=92)
    out, h, w = decode_jpeg_resize_native(b.getvalue(), 64, False)
    assert out.shape == (64, 64, 3) and (h, w) == (200, 200)
    # gray -> RGB: all three channels equal
    assert (out[..., 0] == out[..., 1]).all()
    ref = np.asarray(
        Image.open(io.BytesIO(b.getvalue())).convert("RGB").resize(
            (64, 64), Image.BILINEAR), np.uint8)
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert d.mean() < 3.0


@needs_native
def test_native_survives_corrupted_jpegs():
    """The C error path (setjmp unwind) must reject or partially decode —
    never crash — on truncated/bit-flipped/spliced inputs. 150 deterministic
    mutations (a 600-case sweep ran clean during development)."""
    rng = np.random.default_rng(42)
    base = bytearray(_jpeg_bytes(_photo(200, 300, seed=11), quality=85))
    for trial in range(150):
        data = bytearray(base)
        kind = trial % 3
        if kind == 0:
            data = data[:rng.integers(2, len(data))]
        elif kind == 1:
            for _ in range(int(rng.integers(1, 20))):
                data[rng.integers(0, len(data))] = rng.integers(0, 256)
        else:
            i = int(rng.integers(0, len(data)))
            data[i:i] = bytes(
                rng.integers(0, 256, int(rng.integers(1, 64)), dtype=np.uint8))
        r = decode_jpeg_resize_native(bytes(data), 64, trial % 2 == 0)
        if r is not None:
            assert r[0].shape == (64, 64, 3)


@needs_native
def test_native_rejects_hostile_dims():
    """A few-KB file declaring 30x65500 would need ~400 MB of resample
    buffer; the C path must reject it (PIL fallback) instead of allocating
    or terminating on bad_alloc."""
    b = io.BytesIO()
    Image.fromarray(np.zeros((16, 16), np.uint8), "L").save(b, "JPEG")
    data = bytearray(b.getvalue())
    i = bytes(data).find(b"\xff\xc0")  # SOF0: patch declared dims
    data[i + 5:i + 7] = (65500).to_bytes(2, "big")
    data[i + 7:i + 9] = (30).to_bytes(2, "big")
    assert decode_jpeg_resize_native(bytes(data), 512, False) is None


def test_prepare_batch_honors_pil_backend(tmp_path):
    """Predictor-level decode_backend='pil' must reach prepare_batch: the
    path input then matches PIL decode+resize exactly."""
    from shape_based_object_detection_tpu.serving import prepare_batch

    img = _photo(150, 200, seed=12)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=92)
    batch, sizes = prepare_batch([p], 64, 1, decode_backend="pil")
    decoded = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    ref = np.asarray(
        Image.fromarray(decoded).resize((64, 64), Image.BILINEAR), np.uint8)
    assert (batch[0] == ref).all() and sizes == [(150, 200)]


@needs_native
def test_native_rejects_garbage():
    assert decode_jpeg_resize_native(b"definitely not a jpeg file", 64,
                                     False) is None
    assert decode_jpeg_resize_native(_jpeg_bytes(_photo())[:100], 64,
                                     False) is None  # truncated


def test_loader_helper_falls_back_to_pil_for_png(tmp_path):
    img = _photo(100, 150, seed=6)
    p = str(tmp_path / "a.png")
    Image.fromarray(img).save(p)
    out, h, w = load_resized_image_host(p, 64, False, backend="auto")
    assert out.shape == (64, 64, 3) and (h, w) == (100, 150)
    ref = np.asarray(
        Image.fromarray(img).resize((64, 64), Image.BILINEAR), np.uint8)
    assert (out == ref).all()  # PNG takes the exact PIL path


def test_loader_helper_pil_backend_is_exact(tmp_path):
    img = _photo(120, 90, seed=7)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=92)
    out, h, w = load_resized_image_host(p, 64, False, backend="pil")
    decoded = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    ref = np.asarray(
        Image.fromarray(decoded).resize((64, 64), Image.BILINEAR), np.uint8)
    assert (out == ref).all() and (h, w) == (120, 90)
    # letterbox PIL path
    out2, _, _ = load_resized_image_host(p, 64, True, backend="pil")
    assert (out2 == letterbox_image_host(decoded, 64)).all()


def test_loader_helper_accepts_bytes():
    data = _jpeg_bytes(_photo(100, 100, seed=8))
    out, h, w = load_resized_image_host(data, 32, False, backend="auto")
    assert out.shape == (32, 32, 3) and (h, w) == (100, 100)


def test_prepare_batch_accepts_paths_and_bytes(tmp_path):
    """serving.prepare_batch routes path/bytes items through the fused
    decode; results match feeding the pre-decoded array within decode
    tolerance, and sizes are the original dims."""
    from shape_based_object_detection_tpu.serving import prepare_batch

    img = _photo(180, 240, seed=10)
    p = str(tmp_path / "a.jpg")
    Image.fromarray(img).save(p, quality=92)
    decoded = np.asarray(Image.open(p).convert("RGB"), np.uint8)
    data = open(p, "rb").read()

    batch, sizes = prepare_batch([p, data, decoded], 96, 4)
    assert batch.shape == (4, 96, 96, 3)
    assert sizes == [(180, 240)] * 3
    assert (batch[3] == 0).all()  # padding slot untouched
    for i in range(2):
        d = np.abs(batch[i].astype(np.int32) - batch[2].astype(np.int32))
        assert d.mean() < 3.0, (i, d.mean())
    # letterbox mode: bottom padding zero for a wide image
    batch_lb, sizes_lb = prepare_batch([p], 96, 1, letterbox=True)
    nh = round(180 * 96 / 240)
    assert sizes_lb == [(180, 240)] and (batch_lb[0, nh:] == 0).all()


def test_effective_decode_backend_values():
    assert effective_decode_backend("pil") == "pil"
    r = effective_decode_backend("auto")
    assert r in ("native", "pil")
    if load_image_lib() is not None:
        assert r == "native"
        # "native" is an assertion, honored when the lib is present
        assert effective_decode_backend("native") == "native"
    with pytest.raises(ValueError):
        effective_decode_backend("turbo")


def test_native_backend_fails_loud_without_lib(monkeypatch):
    """decode_backend='native' must raise (not silently fall back to PIL)
    when the C library is unavailable."""
    import shape_based_object_detection_tpu.utils.image as image_mod
    import shape_based_object_detection_tpu.utils.native as native_mod

    monkeypatch.setattr(native_mod, "load_image_lib", lambda: None)
    assert image_mod.effective_decode_backend("auto") == "pil"
    with pytest.raises(RuntimeError, match="decode_backend='native'"):
        image_mod.effective_decode_backend("native")


def test_dataset_backends_agree(tmp_path):
    """VOC dataset output with native vs PIL decode: same boxes/labels,
    near-identical pixels."""
    if load_image_lib() is None:
        pytest.skip("native image lib unavailable")
    root = tmp_path / "voc"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    Image.fromarray(_photo(200, 300, seed=9)).save(
        root / "JPEGImages" / "im1.jpg", quality=92)
    (root / "Annotations" / "im1.xml").write_text(
        "<annotation><size><width>300</width><height>200</height></size>"
        "<object><name>cat</name><bndbox><xmin>31</xmin><ymin>41</ymin>"
        "<xmax>101</xmax><ymax>121</ymax></bndbox></object></annotation>")
    (root / "ImageSets" / "Main" / "train.txt").write_text("im1\n")

    from shape_based_object_detection_tpu.data.voc import VOCDetection

    ds_n = VOCDetection(str(root), image_size=96, decode_backend="auto")
    ds_p = VOCDetection(str(root), image_size=96, decode_backend="pil")
    assert ds_n.decode_backend == "native" and ds_p.decode_backend == "pil"
    img_n, boxes_n, labels_n = ds_n[0]
    img_p, boxes_p, labels_p = ds_p[0]
    np.testing.assert_array_equal(boxes_n, boxes_p)
    np.testing.assert_array_equal(labels_n, labels_p)
    d = np.abs(img_n.astype(np.int32) - img_p.astype(np.int32))
    assert d.mean() < 3.0, d.mean()


def test_cache_fingerprint_keys_on_decode_backend(tmp_path):
    """A sample cache built with one decode backend must not be reused by
    the other (pixels differ)."""
    from shape_based_object_detection_tpu.data.cache import (
        _cache_valid, _source_fingerprint,
    )

    class _FakeDs:
        image_size = 64
        letterbox = False
        root = "/x"
        decode_backend = "native"

        def __len__(self):
            return 4

    fp_native = _source_fingerprint(_FakeDs(), max_boxes=8)
    ds_pil = _FakeDs()
    ds_pil.decode_backend = "pil"
    fp_pil = _source_fingerprint(ds_pil, max_boxes=8)
    assert fp_native != fp_pil
    assert fp_native["decode_backend"] == "native"
