"""Mesh/sharding tests (SURVEY.md §4 item 4): the multi-host DP path on 8
virtual CPU devices — validates the config #5 sharding without a pod."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import train as train_lib
from shape_based_object_detection_tpu.models.factory import build_model
from shape_based_object_detection_tpu.parallel import (
    make_mesh, batch_sharding, replicated_sharding,
)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8  # conftest forces 8 virtual CPU devices
    assert mesh.axis_names == ("data", "model")

    cfg = config_lib.MeshConfig(model_parallelism=2)
    mesh2 = make_mesh(cfg=cfg)
    assert mesh2.devices.shape == (4, 2)


@pytest.fixture(scope="module")
def dp_setup():
    """One tiny model + ONE compiled train step shared by the DP tests."""
    model_cfg = config_lib.tiny_test_model("retinanet")
    cfg = config_lib.ExperimentConfig(
        model=model_cfg,
        data=dataclasses.replace(
            config_lib.DataConfig(batch_size=8, max_boxes=4),
            photometric=False, expand=False, random_crop=False, hflip=False,
        ),
        train=dataclasses.replace(config_lib.TrainConfig(), weight_decay=0.0,
                                  grad_clip_norm=1e9),
        loss=config_lib.LossConfig(kind="focal"),
    )
    module, variables, anchors = build_model(model_cfg)
    step_fn = train_lib.make_train_step(module, anchors, cfg, augment=False)
    return cfg, module, variables, anchors, step_fn


def _batch(cfg, b):
    g, s = cfg.data.max_boxes, cfg.model.image_size
    rng = np.random.default_rng(0)
    return {
        "images": rng.integers(0, 255, (b, s, s, 3), dtype=np.uint8),
        "boxes": np.tile(np.asarray([0.2, 0.2, 0.6, 0.6], np.float32), (b, g, 1)),
        "labels": np.ones((b, g), np.int32),
        "valid": np.tile(np.asarray([True] + [False] * (g - 1)), (b, 1)),
    }


def test_data_parallel_train_step_on_mesh(dp_setup):
    """Full train step sharded over 8 devices: grads all-reduce via XLA."""
    cfg, module, variables, anchors, step_fn = dp_setup
    state = train_lib.create_train_state(module, variables, cfg)

    mesh = make_mesh()
    dshard = batch_sharding(mesh)
    state = jax.device_put(state, replicated_sharding(mesh))
    batch = {k: jax.device_put(v, dshard) for k, v in _batch(cfg, 8).items()}

    new_state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params must stay replicated after the update
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_sharded_equals_single_device(dp_setup):
    """DP-sharded step == unsharded step (same data, same result)."""
    cfg, module, variables, anchors, step_fn = dp_setup
    batch = _batch(cfg, 8)

    state1 = train_lib.create_train_state(module, variables, cfg)
    _, m1 = step_fn(state1, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh = make_mesh()
    dshard = batch_sharding(mesh)
    state2 = jax.device_put(
        train_lib.create_train_state(module, variables, cfg),
        replicated_sharding(mesh))
    sharded = {k: jax.device_put(v, dshard) for k, v in batch.items()}
    _, m2 = step_fn(state2, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_spatial_sharding_equals_single_device(dp_setup):
    """Hybrid DP x spatial sharding (images' H rows over the 'model' axis):
    GSPMD's automatic halo exchange through the conv stack must reproduce the
    unsharded numerics. This is the config #5 large-resolution lever."""
    from shape_based_object_detection_tpu.parallel import spatial_image_sharding

    cfg, module, variables, anchors, step_fn = dp_setup
    batch = _batch(cfg, 4)

    state1 = train_lib.create_train_state(module, variables, cfg)
    _, m1 = step_fn(state1, jax.tree_util.tree_map(jnp.asarray, batch))

    mesh_cfg = config_lib.MeshConfig(model_parallelism=4)
    mesh = make_mesh(cfg=mesh_cfg)  # (2 data, 4 model)
    state2 = jax.device_put(
        train_lib.create_train_state(module, variables, cfg),
        replicated_sharding(mesh))
    sshard = spatial_image_sharding(mesh, mesh_cfg)
    dshard = batch_sharding(mesh, mesh_cfg)
    sharded = dict(batch)
    sharded["images"] = jax.device_put(batch["images"], sshard)
    for k in ("boxes", "labels", "valid"):
        sharded[k] = jax.device_put(batch[k], dshard)
    _, m2 = step_fn(state2, sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m1["grad_norm"]), float(m2["grad_norm"]),
                               rtol=1e-4)


def test_spatial_sharded_detect_equals_single_device(dp_setup):
    """Inference under a hybrid DP x spatial mesh (image rows over 'model'):
    the SAME jitted detect() program on sharded inputs must reproduce the
    single-device detections — the multi-chip serving configuration for
    large-resolution models (GSPMD halo exchange through the conv stack,
    global candidate selection across row shards)."""
    from shape_based_object_detection_tpu.detection import make_detect_fn
    from shape_based_object_detection_tpu.parallel import spatial_image_sharding

    cfg, module, variables, anchors, _ = dp_setup
    detect = make_detect_fn(module, anchors, cfg.model, cfg.data)
    images = _batch(cfg, 4)["images"]

    det1 = detect(variables, jnp.asarray(images))

    mesh_cfg = config_lib.MeshConfig(model_parallelism=4)
    mesh = make_mesh(cfg=mesh_cfg)  # (2 data, 4 model)
    vars_r = jax.device_put(variables, replicated_sharding(mesh))
    imgs_s = jax.device_put(images, spatial_image_sharding(mesh, mesh_cfg))
    det2 = detect(vars_r, imgs_s)

    np.testing.assert_array_equal(np.asarray(det1.valid), np.asarray(det2.valid))
    np.testing.assert_array_equal(np.asarray(det1.labels), np.asarray(det2.labels))
    np.testing.assert_allclose(np.asarray(det1.scores), np.asarray(det2.scores),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(det1.boxes), np.asarray(det2.boxes),
                               rtol=1e-5, atol=1e-6)


def test_graft_entry_dryrun():
    """The driver's multichip dry-run must work on the virtual CPU mesh."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_two_process_distributed_train_step(tmp_path):
    """REAL multi-process jax.distributed on CPU (SURVEY §4 item 4, VERDICT
    r1 item 7): 2 processes x 2 virtual devices, host-sharded Loader input,
    one global train step; post-step params must be identical across
    processes (gradient all-reduce correctness)."""
    import re
    import socket
    import subprocess
    import sys

    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "cache")
    env["SBD_TEST_CKPT_DIR"] = str(tmp_path / "ckpt")
    repo_root = os.path.dirname(os.path.dirname(worker))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(worker)),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            # generous: ~3 min idle-host, but CI-style runs sharing the CPU
            # with other suites have pushed it past 10 (observed once)
            out, _ = p.communicate(timeout=900)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    results = {}
    evals = {}
    for out in outs:
        m = re.search(r"RESULT proc=(\d+) checksum=([\d.]+) loss=([\d.]+)", out)
        assert m, f"no RESULT line:\n{out[-3000:]}"
        results[int(m.group(1))] = (m.group(2), m.group(3))
        e = re.search(r"EVAL proc=(\d+) images=(\d+) map=([\d.]+)", out)
        assert e, f"no EVAL line:\n{out[-3000:]}"
        evals[int(e.group(1))] = (e.group(2), e.group(3))
    assert set(results) == {0, 1}
    assert results[0] == results[1], f"processes diverged: {results}"
    # sharded eval: both hosts cover the FULL dataset between them and
    # compute the identical metric (replicated output + allgathered GT)
    assert set(evals) == {0, 1}
    assert evals[0] == evals[1], f"eval diverged: {evals}"
    # 18 images over 2 hosts = 9/host = 4 full batches + a padded tail of 1
    assert evals[0][0] == "18", f"eval covered {evals[0][0]} of 18 images"
    # multi-process checkpoint: one orbax save across both processes,
    # restored exactly on each (C18 multi-host-safe / crash recovery)
    ckpts = {}
    for out in outs:
        c = re.search(r"CKPT proc=(\d+) step=(\d+) match=(\d) "
                      r"checksum=([\d.]+)", out)
        assert c, f"no CKPT line:\n{out[-3000:]}"
        ckpts[int(c.group(1))] = (c.group(2), c.group(3), c.group(4))
    assert set(ckpts) == {0, 1}
    for i in (0, 1):
        assert ckpts[i][0] == "1" and ckpts[i][1] == "1", (
            f"proc {i} checkpoint restore mismatch: {ckpts}")
    assert ckpts[0][2] == ckpts[1][2], f"restored params diverged: {ckpts}"


def test_quantized_detect_sharded_equals_single_device():
    """The int8 serving path (weight-only AND full-int8) composes with DP
    batch sharding: sharded detections == unsharded detections (serving
    scale-out). The dynamic activation scale is a global abs-max reduction,
    which GSPMD turns into a cross-device all-reduce — same value."""
    from shape_based_object_detection_tpu import quantize as q_lib

    model_cfg = config_lib.tiny_test_model("retinanet")
    data_cfg = config_lib.DataConfig()
    module, variables, anchors = build_model(model_cfg)
    qvars = q_lib.quantize_params(variables)
    rng = np.random.default_rng(3)
    s = model_cfg.image_size
    images = rng.integers(0, 255, (8, s, s, 3), dtype=np.uint8)

    mesh = make_mesh()
    dshard = batch_sharding(mesh)
    for int8_acts in (False, True):
        detect = q_lib.make_quantized_detect_fn(
            module, anchors, model_cfg, data_cfg, use_pallas=False,
            int8_activations=int8_acts)
        ref = detect(qvars, jnp.asarray(images))
        rep = jax.device_put(qvars, replicated_sharding(mesh))
        out = detect(rep, jax.device_put(images, dshard))
        if not int8_acts:
            # weight-only dequant is elementwise-exact: sharded == unsharded
            np.testing.assert_allclose(np.asarray(out.boxes),
                                       np.asarray(ref.boxes), atol=1e-5)
            np.testing.assert_allclose(np.asarray(out.scores),
                                       np.asarray(ref.scores), atol=1e-5)
            np.testing.assert_array_equal(np.asarray(out.valid),
                                          np.asarray(ref.valid))
        else:
            # activation quantization amplifies per-shard conv-algorithm FP
            # jitter to +-1 int8 LSB (~1/127): close, not bit-equal
            np.testing.assert_allclose(np.asarray(out.boxes),
                                       np.asarray(ref.boxes), atol=2e-2)
            np.testing.assert_allclose(np.asarray(out.scores),
                                       np.asarray(ref.scores), atol=2e-2)
            agree = (np.asarray(out.valid) == np.asarray(ref.valid)).mean()
            assert agree > 0.95


def test_mesh_for_batch_rejects_indivisible_model_parallelism():
    """Flooring devices//mp would silently idle devices (review finding)."""
    import pytest

    from shape_based_object_detection_tpu.config import MeshConfig
    from shape_based_object_detection_tpu.parallel.mesh import make_mesh_for_batch

    with pytest.raises(ValueError, match="model_parallelism"):
        make_mesh_for_batch(8, cfg=MeshConfig(model_parallelism=3))
