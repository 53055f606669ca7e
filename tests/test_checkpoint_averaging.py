"""Checkpoint averaging (tools/average_checkpoints.py): leaf-wise mean
over the retention window, EMA handling, CLI selection/guards, and that
the output loads through the standard serving restore path."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import train as train_lib
from shape_based_object_detection_tpu.checkpoint import CheckpointManager
from shape_based_object_detection_tpu.models.factory import build_model

from tools.average_checkpoints import average_states, main as avg_main


def _tiny_cfg(ema_decay=0.0):
    return config_lib.ExperimentConfig(
        model=config_lib.tiny_test_model("retinanet"),
        data=dataclasses.replace(
            config_lib.DataConfig(batch_size=2, max_boxes=4),
            photometric=False, expand=False, random_crop=False, hflip=False),
        train=dataclasses.replace(
            config_lib.TrainConfig(), base_lr=0.01, warmup_steps=5,
            weight_decay=0.0, total_steps=100, lr_decay_steps=(50,),
            ema_decay=ema_decay),
        loss=config_lib.LossConfig(kind="focal"),
    )


def _state_with_constant(template, value, ema_value=None):
    const = jax.tree_util.tree_map(
        lambda x: jnp.full_like(x, value), template.params)
    ema = None
    if template.ema_params is not None:
        ema = jax.tree_util.tree_map(
            lambda x: jnp.full_like(x, ema_value if ema_value is not None
                                    else value),
            template.ema_params)
    return template.replace(params=const, ema_params=ema)


@pytest.fixture(scope="module")
def tiny():
    cfg = _tiny_cfg()
    module, variables, _ = build_model(cfg.model)
    return cfg, module, variables


def test_average_states_is_leafwise_mean(tiny):
    cfg, module, variables = tiny
    template = train_lib.create_train_state(module, variables, cfg)
    states = [_state_with_constant(template, v) for v in (1.0, 2.0, 6.0)]
    avg = average_states(states)
    for leaf in jax.tree_util.tree_leaves(avg.params):
        np.testing.assert_allclose(np.asarray(leaf), 3.0, rtol=1e-6)
        # dtype preserved (accumulated in f32, cast back)
        assert leaf.dtype == jax.tree_util.tree_leaves(
            template.params)[0].dtype


def test_average_states_ema_subtree(tiny):
    cfg, module, variables = tiny
    cfg = _tiny_cfg(ema_decay=0.99)
    template = train_lib.create_train_state(module, variables, cfg)
    states = [_state_with_constant(template, v, ema_value=10.0 * v)
              for v in (1.0, 3.0)]
    avg = average_states(states)
    for leaf in jax.tree_util.tree_leaves(avg.ema_params):
        np.testing.assert_allclose(np.asarray(leaf), 20.0, rtol=1e-6)

    # mixed EMA presence is a hard error, not a silent drop
    mixed = [states[0], states[1].replace(ema_params=None)]
    with pytest.raises(SystemExit, match="EMA"):
        average_states(mixed)


def test_cli_end_to_end(tiny, tmp_path):
    cfg, module, variables = tiny
    template = train_lib.create_train_state(module, variables, cfg)
    ckpt_dir = str(tmp_path / "run")
    mgr = CheckpointManager(ckpt_dir, async_save=False)
    for step, v in ((10, 1.0), (20, 2.0), (30, 3.0)):
        mgr.save(_state_with_constant(template, v).replace(
            step=jnp.asarray(step, jnp.int32)), step=step)
    mgr.wait()
    mgr.close()

    cfg_path = str(tmp_path / "cfg.json")
    config_lib.save_config_file(cfg, cfg_path)
    out = str(tmp_path / "avg")
    avg_main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir,
              "--out", out])

    # loads through the standard serving restore path
    from shape_based_object_detection_tpu.cli.common import (
        restore_checkpoint_variables,
    )
    restored = restore_checkpoint_variables(cfg, module, variables, out)
    for leaf in jax.tree_util.tree_leaves(restored["params"]):
        np.testing.assert_allclose(np.asarray(leaf), 2.0, rtol=1e-6)

    # --last 2 averages only the newest two
    out2 = str(tmp_path / "avg2")
    avg_main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir,
              "--out", out2, "--last", "2"])
    restored2 = restore_checkpoint_variables(cfg, module, variables, out2)
    for leaf in jax.tree_util.tree_leaves(restored2["params"]):
        np.testing.assert_allclose(np.asarray(leaf), 2.5, rtol=1e-6)

    # guards: unknown step, too few checkpoints
    with pytest.raises(SystemExit, match="not retained"):
        avg_main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir,
                  "--out", str(tmp_path / "x"), "--steps", "10,99"])
    with pytest.raises(SystemExit, match=">=2"):
        avg_main(["--config", cfg_path, "--checkpoint-dir", ckpt_dir,
                  "--out", str(tmp_path / "y"), "--steps", "10"])
