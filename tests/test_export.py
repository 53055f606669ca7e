"""AOT export (export.py): serialize detect() -> StableHLO and run it back.

The exported artifact must reproduce the live detect() pipeline exactly and
be callable with no model code (SURVEY.md §3.2 serving surface)."""

import numpy as np
import jax.numpy as jnp
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import export as export_lib
from shape_based_object_detection_tpu.detection import make_detect_fn
from shape_based_object_detection_tpu.models.factory import build_model


@pytest.fixture(scope="module")
def tiny_cfg():
    return config_lib.get_config("tiny_retinanet")


@pytest.fixture(scope="module")
def exported_blob(tiny_cfg):
    return export_lib.export_from_config(
        tiny_cfg, batch_size=2, platforms=("cpu",))


def test_export_roundtrip_matches_live_detect(tiny_cfg, rng):
    cfg = tiny_cfg
    module, variables, anchors = build_model(cfg.model)
    blob = export_lib.export_detect(
        module, variables, anchors, cfg.model, cfg.data,
        batch_size=2, platforms=("cpu",))

    loaded = export_lib.load_detect(blob)
    size = cfg.model.image_size
    images = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)

    got = loaded(images)
    detect = make_detect_fn(module, anchors, cfg.model, cfg.data,
                            use_pallas=False)
    want = detect(variables, jnp.asarray(images))

    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(want.valid))
    np.testing.assert_allclose(np.asarray(got.boxes), np.asarray(want.boxes),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.scores), np.asarray(want.scores),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.labels),
                                  np.asarray(want.labels))


def test_artifact_header_and_magic(exported_blob, tiny_cfg):
    loaded = export_lib.load_detect(exported_blob)
    h = loaded.header
    assert h["model"] == tiny_cfg.model.name
    assert h["batch_size"] == 2
    assert h["image_size"] == tiny_cfg.model.image_size
    assert h["outputs"] == ["boxes", "scores", "labels", "valid"]

    with pytest.raises(ValueError, match="magic"):
        export_lib.load_detect(b"garbage!" + exported_blob[8:])


def test_artifact_file_roundtrip(exported_blob, tmp_path, rng):
    path = str(tmp_path / "model.sbdx")
    export_lib.save_artifact(exported_blob, path)
    loaded = export_lib.load_artifact(path)
    size = loaded.header["image_size"]
    images = rng.integers(0, 255, (2, size, size, 3)).astype(np.uint8)
    det = loaded(images)
    assert det.boxes.shape[0] == 2
    assert det.scores.shape == det.labels.shape == det.valid.shape


def test_multi_platform_export_includes_tpu(tiny_cfg):
    blob = export_lib.export_from_config(
        tiny_cfg, batch_size=1, platforms=("tpu", "cpu"))
    loaded = export_lib.load_detect(blob)
    assert loaded.header["platforms"] == ["tpu", "cpu"]
    # still runnable on the CPU test platform
    size = loaded.header["image_size"]
    det = loaded(np.zeros((1, size, size, 3), np.uint8))
    assert det.boxes.shape[1] == tiny_cfg.model.detect.max_detections


def test_export_cli_tool(tmp_path, capsys):
    import tools.export_model as tool

    out = str(tmp_path / "tiny.sbdx")
    tool.main(["--config", "tiny_retinanet", "--batch-size", "1",
               "--platforms", "cpu", "--out", out])
    assert "wrote" in capsys.readouterr().out
    loaded = export_lib.load_artifact(out)
    assert loaded.header["batch_size"] == 1


def test_export_dtype_override(tiny_cfg, rng):
    """--dtype bfloat16 bakes the throughput configuration into the artifact."""
    blob = export_lib.export_from_config(
        tiny_cfg, batch_size=1, platforms=("cpu",), dtype="bfloat16")
    loaded = export_lib.load_detect(blob)
    size = loaded.header["image_size"]
    det = loaded(rng.integers(0, 255, (1, size, size, 3)).astype(np.uint8))
    assert det.boxes.shape[0] == 1


def test_export_int8_activations_requires_quantize(tiny_cfg):
    with pytest.raises(ValueError, match="requires quantize"):
        export_lib.export_from_config(tiny_cfg, batch_size=1,
                                      platforms=("cpu",), quantize=False,
                                      int8_activations=True)
