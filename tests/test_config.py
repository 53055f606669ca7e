"""JSON config serialization (component C1 — the reference's per-run JSON
config files): round-trip, dotted overrides, typo guard, CLI integration."""

import json

import pytest

from shape_based_object_detection_tpu import config as config_lib


def test_json_roundtrip_all_presets():
    for name in ("config1_ssd300_infer", "config2_retinanet_r50_infer",
                 "config3_ssd512_voc_train", "config4_retinanet_r101_coco_train",
                 "config5_multihost_dp_train", "tiny_ssd", "tiny_retinanet"):
        cfg = config_lib.get_config(name)
        d = config_lib.config_to_dict(cfg)
        json.dumps(d)  # JSON-serializable
        back = config_lib.config_from_dict(d)
        assert back == cfg, name  # frozen dataclasses: structural equality


def test_config_file_roundtrip(tmp_path):
    cfg = config_lib.get_config("config3_ssd512_voc_train")
    path = str(tmp_path / "run.json")
    config_lib.save_config_file(cfg, path)
    assert config_lib.load_config_file(path) == cfg
    # resolve_config dispatches on the .json suffix
    assert config_lib.resolve_config(path) == cfg


def test_overrides():
    cfg = config_lib.get_config("tiny_ssd")
    out = config_lib.apply_overrides(cfg, [
        "model.image_size=512",
        "data.letterbox=true",
        "train.lr_decay_steps=[100, 200]",
        "loss.kind=focal",
    ])
    assert out.model.image_size == 512
    assert out.data.letterbox is True
    assert out.train.lr_decay_steps == (100, 200)
    assert out.loss.kind == "focal"
    # tuples stay hashable (configs are jit static args)
    hash(out)


def test_unknown_key_raises():
    cfg = config_lib.get_config("tiny_ssd")
    with pytest.raises(KeyError):
        config_lib.apply_overrides(cfg, ["model.imge_size=512"])
    with pytest.raises(KeyError):
        config_lib.config_from_dict({"modell": {}})
    with pytest.raises(ValueError):
        config_lib.apply_overrides(cfg, ["model.image_size"])


def test_train_cli_dump_and_rerun(tmp_path, capsys):
    from shape_based_object_detection_tpu.cli.train_cli import main

    path = str(tmp_path / "cfg.json")
    # dump only (no --steps): writes the resolved config and exits
    main(["--config", "tiny_retinanet", "--set", "data.batch_size=4",
          "--dump-config", path])
    out = capsys.readouterr().out
    assert "wrote resolved config" in out
    cfg = config_lib.load_config_file(path)
    assert cfg.data.batch_size == 4
    # the dumped file is a runnable --config
    main(["--config", path, "--steps", "2",
          "--checkpoint-dir", str(tmp_path / "ckpt"), "--log-every", "100"])
    out = capsys.readouterr().out
    assert "done at step 2" in out


def test_scalar_for_tuple_field_raises():
    """A tuple-typed field given a bare scalar must fail at the override
    site with a clear message, not deep inside a trace (review finding)."""
    cfg = config_lib.get_config("tiny_ssd")
    with pytest.raises(TypeError, match="JSON list"):
        config_lib.apply_overrides(cfg, ["train.lr_decay_steps=80000"])
    with pytest.raises(TypeError, match="JSON list"):
        config_lib.apply_overrides(cfg, ["model.anchors.variances=0.1"])
    # the documented list form still works
    out = config_lib.apply_overrides(cfg, ["train.lr_decay_steps=[80000]"])
    assert out.train.lr_decay_steps == (80000,)


def test_ssd512_alias_is_coco_80_classes():
    """Model-name aliases are all COCO 80-class (the 'ssd512' alias used to
    silently return the 20-class VOC trainer while 'ssd300' returned COCO)."""
    for name in ("ssd300", "ssd512", "retinanet_r50_fpn", "retinanet_r101_fpn"):
        assert config_lib.get_config(name).model.num_classes == 80, name
    # the VOC training preset is untouched
    assert config_lib.get_config("config3_ssd512_voc_train").model.num_classes == 20
