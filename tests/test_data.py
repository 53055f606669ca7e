"""Dataset / pipeline tests (components C2, C3, C5)."""

import json
import os

import numpy as np
import pytest

from shape_based_object_detection_tpu.data.pipeline import Loader, pad_annotations
from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
from shape_based_object_detection_tpu.data.voc import parse_voc_xml, VOCDetection
from shape_based_object_detection_tpu.data.coco import CocoAnnotations, CocoDetection


def test_pad_annotations():
    boxes = np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32)
    labels = np.asarray([3], np.int32)
    b, l, v = pad_annotations(boxes, labels, 5)
    assert b.shape == (5, 4) and l.shape == (5,) and v.shape == (5,)
    assert v.tolist() == [True, False, False, False, False]
    assert l[0] == 3


def test_pad_annotations_truncates():
    boxes = np.tile(np.asarray([[0.1, 0.1, 0.5, 0.5]], np.float32), (8, 1))
    labels = np.arange(8, dtype=np.int32)
    b, l, v = pad_annotations(boxes, labels, 4)
    assert v.all() and b.shape == (4, 4)


def test_synthetic_dataset():
    ds = SyntheticDetection(size=64, num_images=10, num_classes=3)
    img, boxes, labels = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert boxes.shape[1] == 4
    assert (labels >= 1).all() and (labels <= 3).all()
    # deterministic
    img2, boxes2, _ = ds[0]
    np.testing.assert_array_equal(img, img2)


def test_synthetic_aspect_std():
    """aspect_std>0 yields valid boxes with a real extreme-aspect tail, and
    aspect_std=0 (default) stays bit-identical to the original sampler
    (existing overfit/eval oracles depend on those exact pixels)."""
    base = SyntheticDetection(size=128, num_images=8, seed=3)
    same = SyntheticDetection(size=128, num_images=8, seed=3, aspect_std=0.0)
    for i in range(4):
        np.testing.assert_array_equal(base[i][0], same[i][0])
        np.testing.assert_array_equal(base[i][1], same[i][1])

    thin = SyntheticDetection(size=128, num_images=64, seed=3, aspect_std=1.2)
    ars = []
    for i in range(64):
        _, boxes, labels = thin[i]
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        assert (w > 0).all() and (h > 0).all()
        assert (boxes >= 0).all() and (boxes <= 1).all()
        ars.extend((w / h).tolist())
    ars = np.asarray(ars)
    # a real tail: some boxes beyond 3:1 either way
    assert (ars > 3).any() and (ars < 1 / 3).any()


def test_synthetic_small_object_split():
    """area_lo/area_hi confine sampled boxes to the requested area band —
    the small-object-heavy benchmark variant (COCO small stratum is
    area < 32^2 original px, i.e. < 1024/size^2 normalized at eval's
    area_scale=size)."""
    ds = SyntheticDetection(size=512, num_images=32, seed=5, aspect_std=0.3,
                            area_lo=0.0005, area_hi=0.0035)
    areas = []
    for i in range(32):
        _, boxes, _ = ds[i]
        w = boxes[:, 2] - boxes[:, 0]
        h = boxes[:, 3] - boxes[:, 1]
        assert (w > 0).all() and (h > 0).all()
        areas.extend((w * h * 512 * 512).tolist())
    areas = np.asarray(areas)
    # every box under the COCO small-area threshold (tiny slack for the
    # >=4px minimum-side clamp)
    assert np.median(areas) < 1024
    assert (areas < 1500).all()


def test_synthetic_class_aspect():
    """class_aspect>0 correlates elongation with class id (the benchmark
    engineered to FAVOR shape-similarity matching): per-class mean
    log-aspect must increase monotonically from class 1 to class C, and the
    knob must leave default splits bit-identical."""
    base = SyntheticDetection(size=128, num_images=6, seed=4)
    same = SyntheticDetection(size=128, num_images=6, seed=4,
                              class_aspect=0.0)
    for i in range(4):
        np.testing.assert_array_equal(base[i][0], same[i][0])
        np.testing.assert_array_equal(base[i][1], same[i][1])

    ds = SyntheticDetection(size=256, num_images=96, seed=4, aspect_std=0.15,
                            class_aspect=1.2, num_classes=4)
    by_class = {c: [] for c in range(1, 5)}
    for i in range(96):
        _, boxes, labels = ds[i]
        for b, l in zip(boxes, labels):
            ar = (b[2] - b[0]) / (b[3] - b[1])
            by_class[int(l)].append(np.log(ar))
    means = [np.mean(by_class[c]) for c in range(1, 5)]
    assert all(m2 > m1 for m1, m2 in zip(means, means[1:])), means
    assert means[0] < -0.4 and means[-1] > 0.4


def test_loader_batches():
    ds = SyntheticDetection(size=32, num_images=10)
    loader = Loader(ds, batch_size=4, max_boxes=6)
    batches = list(loader.batches())
    assert len(batches) == 2  # ragged tail dropped
    b = batches[0]
    assert b.images.shape == (4, 32, 32, 3)
    assert b.boxes.shape == (4, 6, 4)
    assert b.valid.any()


def test_loader_host_sharding():
    ds = SyntheticDetection(size=32, num_images=16)
    l0 = Loader(ds, 2, 4, host_id=0, num_hosts=2)
    l1 = Loader(ds, 2, 4, host_id=1, num_hosts=2)
    i0 = l0._epoch_indices(0)
    i1 = l1._epoch_indices(0)
    assert len(set(i0) & set(i1)) == 0
    assert len(i0) + len(i1) == 16


VOC_XML = """<annotation>
  <size><width>100</width><height>200</height><depth>3</depth></size>
  <object><name>dog</name><difficult>0</difficult>
    <bndbox><xmin>11</xmin><ymin>21</ymin><xmax>51</xmax><ymax>101</ymax></bndbox>
  </object>
  <object><name>cat</name><difficult>1</difficult>
    <bndbox><xmin>1</xmin><ymin>1</ymin><xmax>10</xmax><ymax>10</ymax></bndbox>
  </object>
</annotation>"""


def test_parse_voc_xml(tmp_path):
    p = tmp_path / "im1.xml"
    p.write_text(VOC_XML)
    boxes, labels, (h, w), difficult = parse_voc_xml(str(p))
    assert (h, w) == (200, 100)
    assert boxes.shape == (1, 4)  # difficult cat skipped
    np.testing.assert_allclose(boxes[0], [10, 20, 50, 100])
    assert labels[0] == 12  # dog is class 12 (1-based) in VOC ordering
    assert not difficult.any()

    boxes2, labels2, _, diff2 = parse_voc_xml(str(p), keep_difficult=True)
    assert boxes2.shape == (2, 4)
    assert diff2.tolist() == [False, True]


def test_voc_dataset_end_to_end(tmp_path):
    from PIL import Image

    root = tmp_path / "VOC"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    Image.fromarray(np.zeros((200, 100, 3), np.uint8)).save(
        root / "JPEGImages" / "im1.jpg")
    (root / "Annotations" / "im1.xml").write_text(VOC_XML)
    (root / "ImageSets" / "Main" / "train.txt").write_text("im1\n")

    ds = VOCDetection(str(root), "train", image_size=64)
    assert len(ds) == 1
    img, boxes, labels = ds[0]
    assert img.shape == (64, 64, 3)
    np.testing.assert_allclose(boxes[0], [0.1, 0.1, 0.5, 0.5])


COCO_JSON = {
    "images": [
        {"id": 7, "file_name": "a.jpg", "height": 100, "width": 200},
    ],
    "categories": [
        {"id": 1, "name": "person"},
        {"id": 3, "name": "car"},
        {"id": 90, "name": "toothbrush"},
    ],
    "annotations": [
        {"id": 1, "image_id": 7, "category_id": 3, "bbox": [10, 20, 30, 40],
         "iscrowd": 0, "area": 1200},
        {"id": 2, "image_id": 7, "category_id": 90, "bbox": [0, 0, 5, 5],
         "iscrowd": 1, "area": 25},
    ],
}


def test_coco_annotations(tmp_path):
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(COCO_JSON))
    coco = CocoAnnotations(str(p))
    # contiguous remap: cat ids 1, 3, 90 -> labels 1, 2, 3
    assert coco.cat_id_to_label == {1: 1, 3: 2, 90: 3}
    boxes, labels = coco.boxes_for_image(7)
    assert boxes.shape == (1, 4)  # crowd skipped
    np.testing.assert_allclose(boxes[0], [10, 20, 40, 60])  # xywh -> xyxy
    assert labels[0] == 2


def test_coco_dataset_end_to_end(tmp_path):
    from PIL import Image

    p = tmp_path / "ann.json"
    p.write_text(json.dumps(COCO_JSON))
    Image.fromarray(np.zeros((100, 200, 3), np.uint8)).save(tmp_path / "a.jpg")
    ds = CocoDetection(str(tmp_path), str(p), image_size=32)
    assert len(ds) == 1
    img, boxes, labels = ds[0]
    assert img.shape == (32, 32, 3)
    np.testing.assert_allclose(boxes[0], [0.05, 0.2, 0.2, 0.6])


def test_loader_workers_same_batches():
    """workers>1 (thread-pool sample fetch) must yield identical batches."""
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection

    ds = SyntheticDetection(size=64, num_images=16, num_classes=4)
    serial = Loader(ds, batch_size=4, max_boxes=6, workers=0)
    pooled = Loader(ds, batch_size=4, max_boxes=6, workers=4)
    for b1, b2 in zip(serial.batches(epoch=1), pooled.batches(epoch=1)):
        np.testing.assert_array_equal(b1.images, b2.images)
        np.testing.assert_array_equal(b1.boxes, b2.boxes)
        np.testing.assert_array_equal(b1.labels, b2.labels)
        np.testing.assert_array_equal(b1.valid, b2.valid)


def test_memmap_cache_roundtrip(tmp_path):
    """build_cache + CacheLoader: same sample content as the plain Loader
    (batch membership identical per epoch; within-batch order may differ —
    CacheLoader sorts indices for sequential IO)."""
    from shape_based_object_detection_tpu.data.cache import (
        CacheLoader, MemmapDetection, build_cache,
    )
    from shape_based_object_detection_tpu.data.pipeline import Loader
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection

    ds = SyntheticDetection(size=64, num_images=12, num_classes=4)
    cache_dir = str(tmp_path / "cache")
    build_cache(ds, cache_dir, max_boxes=6, workers=2)
    # idempotent rebuild
    build_cache(ds, cache_dir, max_boxes=6)

    mm = MemmapDetection(cache_dir)
    assert len(mm) == 12
    img0, bx0, lb0, cr0 = mm[0]  # 4-tuple: crowd flags survive the cache
    ref = ds[0]
    np.testing.assert_array_equal(img0, ref[0])
    np.testing.assert_allclose(bx0, ref[1])
    assert cr0.dtype == bool and not cr0.any()  # synthetic has no crowds

    plain = Loader(ds, batch_size=4, max_boxes=6, workers=0)
    cached = CacheLoader(mm, batch_size=4, max_boxes=6)
    for b1, b2 in zip(plain.batches(epoch=1), cached.batches(epoch=1)):
        # same multiset of images per batch (order may be sorted)
        s1 = sorted(b1.images.sum(axis=(1, 2, 3)).tolist())
        s2 = sorted(b2.images.sum(axis=(1, 2, 3)).tolist())
        assert s1 == s2
        assert b2.crowd.shape == b2.valid.shape


def test_grain_loader_facade():
    from shape_based_object_detection_tpu.data.grain_pipeline import GrainLoader
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection

    ds = SyntheticDetection(size=64, num_images=8, num_classes=4)
    gl = GrainLoader(ds, batch_size=4, max_boxes=6, workers=0)
    batches = list(gl.batches(epoch=0))
    assert len(batches) == 2
    assert batches[0].images.shape == (4, 64, 64, 3)
    assert batches[0].crowd.shape == (4, 6)


def test_cache_fingerprint_invalidation(tmp_path):
    """A cache is reused only when the full source fingerprint matches:
    same-length datasets with a different image_size (or max_boxes) must
    trigger a rebuild, not silent reuse of stale pixels."""
    import json
    import os

    from shape_based_object_detection_tpu.data.cache import build_cache
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection

    cache_dir = str(tmp_path / "cache")
    ds64 = SyntheticDetection(size=64, num_images=8, num_classes=4)
    build_cache(ds64, cache_dir, max_boxes=6, workers=1)
    mtime = os.path.getmtime(os.path.join(cache_dir, "images.npy"))

    # same fingerprint: reused (file untouched)
    build_cache(ds64, cache_dir, max_boxes=6, workers=1)
    assert os.path.getmtime(os.path.join(cache_dir, "images.npy")) == mtime

    # same length, different image size: rebuilt
    ds32 = SyntheticDetection(size=32, num_images=8, num_classes=4)
    build_cache(ds32, cache_dir, max_boxes=6, workers=1)
    with open(os.path.join(cache_dir, "meta.json")) as f:
        meta = json.load(f)
    assert meta["image_size"] == 32
    # lock released
    assert not os.path.exists(os.path.join(cache_dir, ".build_lock"))

    # different max_boxes: rebuilt again
    build_cache(ds32, cache_dir, max_boxes=3, workers=1)
    with open(os.path.join(cache_dir, "meta.json")) as f:
        assert json.load(f)["max_boxes"] == 3


def test_cache_concurrent_builders(tmp_path):
    """Two processes calling build_cache on the same directory concurrently:
    the lockfile serializes them and both end with one consistent cache."""
    import subprocess
    import sys

    cache_dir = str(tmp_path / "cache")
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prog = f"""
import os, sys
sys.path.insert(0, {repo!r})
# canonical CPU-forcing recipe (conftest.py): the axon plugin overrides the
# inherited env var at import, so the config update is required too — a child
# that touches a jax backend must never create a TPU client here
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from shape_based_object_detection_tpu.data.cache import build_cache
from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
ds = SyntheticDetection(size=48, num_images=16, num_classes=4)
build_cache(ds, {repr(cache_dir)}, max_boxes=6, workers=1)
print("built-ok")
"""
    procs = [subprocess.Popen([sys.executable, "-c", prog],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE)
             for _ in range(2)]
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()
        assert b"built-ok" in out
    import os

    from shape_based_object_detection_tpu.data.cache import MemmapDetection
    from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection

    assert not os.path.exists(os.path.join(cache_dir, ".build_lock"))
    mm = MemmapDetection(cache_dir)
    assert len(mm) == 16
    ref = SyntheticDetection(size=48, num_images=16, num_classes=4)[0]
    np.testing.assert_array_equal(mm[0][0], ref[0])


def test_loader_host_shards_equal_length():
    """Hosts always yield identical batch counts (unequal shards would
    deadlock SPMD collectives): odd datasets truncate."""
    ds = SyntheticDetection(size=32, num_images=15)
    l0 = Loader(ds, 2, 4, host_id=0, num_hosts=2)
    l1 = Loader(ds, 2, 4, host_id=1, num_hosts=2)
    i0, i1 = l0._epoch_indices(0), l1._epoch_indices(0)
    assert len(i0) == len(i1) == 7
    assert len(set(i0) & set(i1)) == 0


def test_loader_raises_when_shard_smaller_than_batch():
    ds = SyntheticDetection(size=32, num_images=4)
    loader = Loader(ds, batch_size=8, max_boxes=4)
    with pytest.raises(ValueError, match="batch_size"):
        next(loader.batches())


def test_voc_difficult_as_ignore(tmp_path):
    """include_difficult=True routes VOC difficult objects into eval as
    plain ignore regions: a detection on one is neither TP nor FP (official
    VOC protocol), and missing one costs no recall."""
    from PIL import Image

    from shape_based_object_detection_tpu.eval import Evaluator

    root = tmp_path / "VOC"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "Annotations").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    Image.fromarray(np.zeros((200, 100, 3), np.uint8)).save(
        root / "JPEGImages" / "im1.jpg")
    (root / "Annotations" / "im1.xml").write_text(VOC_XML)
    (root / "ImageSets" / "Main" / "val.txt").write_text("im1\n")

    ds = VOCDetection(str(root), "val", image_size=64, include_difficult=True)
    img, boxes, labels, difficult = ds[0]
    assert difficult.tolist() == [False, True]

    class Det:  # minimal Detections stand-in
        def __init__(self, b, s, l, v):
            self.boxes, self.scores, self.labels, self.valid = b, s, l, v

    # detect BOTH objects perfectly; the difficult one must not add TP or FP
    det = Det(boxes[None], np.asarray([[0.9, 0.8]], np.float32),
              (labels - 1)[None], np.ones((1, 2), bool))
    ev = Evaluator()
    ev.add_batch(det, boxes[None], (labels - 1)[None],
                 np.ones((1, 2), bool), gt_ignore=difficult[None])
    m = ev.voc()
    assert m["mAP"] == pytest.approx(1.0)
    # a class whose only GT is difficult has UNDEFINED AP (n_gt=0): it is
    # excluded from per_class/mAP (pycocotools -1 semantics), and the
    # overall mAP rests on the non-difficult class alone
    assert int(labels[1] - 1) not in m["per_class"]
    assert set(m["per_class"]) == {int(labels[0] - 1)}


def test_cache_fingerprint_covers_dataset_identity(tmp_path):
    """Same length/size/type but a different generator seed (stand-in for
    include_crowd/include_difficult toggles) must invalidate the cache
    (review finding: the fingerprint used to cover only shape-level attrs)."""
    import os

    from shape_based_object_detection_tpu.data.cache import build_cache

    cache_dir = str(tmp_path / "cache")
    build_cache(SyntheticDetection(size=32, num_images=8, seed=0),
                cache_dir, max_boxes=6, workers=1)
    mtime = os.path.getmtime(os.path.join(cache_dir, "images.npy"))
    build_cache(SyntheticDetection(size=32, num_images=8, seed=1),
                cache_dir, max_boxes=6, workers=1)
    assert os.path.getmtime(os.path.join(cache_dir, "images.npy")) != mtime


def test_cache_loader_raises_when_shard_smaller_than_batch(tmp_path):
    from shape_based_object_detection_tpu.data.cache import (
        CacheLoader, MemmapDetection, build_cache)

    cache_dir = str(tmp_path / "cache")
    build_cache(SyntheticDetection(size=32, num_images=4), cache_dir,
                max_boxes=6, workers=1)
    loader = CacheLoader(MemmapDetection(cache_dir), batch_size=8, max_boxes=6)
    with pytest.raises(ValueError, match="batch_size"):
        next(loader.batches(0))


def test_grain_loader_raises_when_shard_smaller_than_batch():
    from shape_based_object_detection_tpu.data.grain_pipeline import GrainLoader

    ds = SyntheticDetection(size=32, num_images=4)
    gl = GrainLoader(ds, batch_size=8, max_boxes=6, workers=0)
    with pytest.raises(ValueError, match="batch_size"):
        next(gl.batches(0))


def test_batches_padded_full_coverage():
    """batches_padded yields every sample exactly once, padding the ragged
    tail to the static shape (batches() drops it — wrong for eval)."""
    ds = SyntheticDetection(size=32, num_images=10)
    loader = Loader(ds, batch_size=4, max_boxes=6, shuffle=False)
    total, shapes = 0, []
    for batch, n_valid in loader.batches_padded():
        shapes.append(batch.images.shape)
        total += n_valid
    assert total == 10  # full coverage: 4 + 4 + 2
    assert all(s == (4, 32, 32, 3) for s in shapes)  # static shapes kept
    # the padded rows of the tail batch repeat the last real sample
    assert len(shapes) == 3
    assert loader.steps_per_epoch() == 2  # train loop still drops the tail


def test_loader_steps_per_epoch_multihost():
    ds = SyntheticDetection(size=32, num_images=15)
    l0 = Loader(ds, 2, 4, host_id=0, num_hosts=2)
    assert l0.steps_per_epoch() == 3  # 14 shared -> 7/host -> 3 full batches


def test_device_cache_loader_matches_cache_loader(tmp_path):
    """DeviceCacheLoader (whole cache staged in device memory, on-device
    batch gathers — zero per-step H2D) yields bit-identical batches to
    CacheLoader, both for training iteration and the padded eval iterator."""
    import jax

    from shape_based_object_detection_tpu.data.cache import (
        CacheLoader, DeviceCacheLoader, MemmapDetection, build_cache,
    )
    from shape_based_object_detection_tpu.data.synthetic import (
        SyntheticDetection,
    )

    ds = SyntheticDetection(size=64, num_images=11, num_classes=4, seed=3)
    cache_dir = str(tmp_path / "cache")
    build_cache(ds, cache_dir, max_boxes=6, workers=1)
    mm = MemmapDetection(cache_dir)
    host = CacheLoader(mm, batch_size=4, max_boxes=6)
    dev = DeviceCacheLoader(MemmapDetection(cache_dir), batch_size=4,
                            max_boxes=6)

    n = 0
    for b1, b2 in zip(host.device_batches(epoch=2),
                      dev.device_batches(epoch=2)):
        assert isinstance(b2.images, jax.Array)
        for a, b in zip(b1, b2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        n += 1
    assert n == 2  # 11 samples / batch 4 -> 2 full train batches

    # eval iterator: full coverage incl. the ragged tail, annotations host-np
    tails = []
    for (b1, v1), (b2, v2) in zip(host.batches_padded(), dev.batches_padded()):
        assert v1 == v2
        assert isinstance(b2.boxes, np.ndarray)
        np.testing.assert_array_equal(np.asarray(b1.images),
                                      np.asarray(b2.images))
        np.testing.assert_array_equal(b1.labels, b2.labels)
        tails.append(v2)
    assert tails == [4, 4, 3]
