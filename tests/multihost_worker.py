"""Worker process for the two-process jax.distributed CPU test
(tests/test_parallel.py::test_two_process_distributed_train_step).

Each process owns 2 virtual CPU devices; the global mesh is 4 devices over
('data', 'model'=1). Per-process data comes from the host-sharded Loader
(the config #5 input path) and is assembled into a global array with
jax.make_array_from_process_local_data. After one train step the processes
print a params checksum — the parent asserts they are identical (the
compiler-inserted gradient all-reduce is the only cross-process traffic).

Usage: python tests/multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

proc_id, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}",
    num_processes=nproc,
    process_id=proc_id,
)

import dataclasses

import numpy as np

from shape_based_object_detection_tpu import config as config_lib
from shape_based_object_detection_tpu import train as train_lib
from shape_based_object_detection_tpu.data.pipeline import Loader
from shape_based_object_detection_tpu.data.synthetic import SyntheticDetection
from shape_based_object_detection_tpu.models.factory import build_model
from shape_based_object_detection_tpu.parallel import (
    batch_sharding, make_mesh, replicated_sharding,
)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc, len(jax.devices())

model_cfg = config_lib.tiny_test_model("retinanet")
cfg = config_lib.ExperimentConfig(
    model=model_cfg,
    data=dataclasses.replace(
        config_lib.DataConfig(batch_size=4, max_boxes=4),
        photometric=False, expand=False, random_crop=False, hflip=False,
    ),
    train=dataclasses.replace(config_lib.TrainConfig(), base_lr=0.01,
                              warmup_steps=1, weight_decay=0.0),
    loss=config_lib.LossConfig(kind="focal"),
)

module, variables, anchors = build_model(model_cfg)
state = train_lib.create_train_state(module, variables, cfg)
train_step = train_lib.make_train_step(module, anchors, cfg, augment=False)

mesh = make_mesh(jax.devices(), cfg.mesh)
dshard = batch_sharding(mesh, cfg.mesh)
rshard = replicated_sharding(mesh)

# the host-sharded input path: each process loads only its slice
ds = SyntheticDetection(size=model_cfg.image_size, num_images=16,
                        num_classes=model_cfg.num_classes)
per_host = cfg.data.batch_size // nproc
loader = Loader(ds, per_host, cfg.data.max_boxes, shuffle=True,
                host_id=proc_id, num_hosts=nproc)
local = next(iter(loader.batches(epoch=0)))

b = cfg.data.batch_size


def globalize(x, sharding):
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(x), global_shape=(b,) + x.shape[1:])


batch = {
    "images": globalize(local.images, dshard),
    "boxes": globalize(local.boxes, dshard),
    "labels": globalize(local.labels, dshard),
    "valid": globalize(local.valid, dshard),
}
state = jax.device_put(state, rshard)
state, metrics = train_step(state, batch)
jax.block_until_ready(metrics)

# params stay fully replicated, so every process can read them directly
leaves = jax.tree_util.tree_leaves(state.params)
checksum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                     for l in leaves))
loss = float(np.asarray(metrics["loss"]))
print(f"RESULT proc={proc_id} checksum={checksum:.6f} loss={loss:.6f}",
    flush=True)

# ---- sharded multi-host EVAL (train_cli.run_eval's multi-process path):
# each host feeds its shard of the global batch, the eval program's output
# is constrained replicated, GT is allgathered — every host must compute
# the identical full-split metric.
import types

from jax.experimental import multihost_utils

from shape_based_object_detection_tpu.eval import Evaluator

eval_step = train_lib.make_eval_step(module, anchors, cfg,
                                     out_sharding=rshard)
# 18 images -> 9 per host -> 4 full batches + a PADDED TAIL (n_valid=1 on
# every host): exercises the tail alignment of the sharded-eval collective
ds_eval = SyntheticDetection(size=model_cfg.image_size, num_images=18,
                             num_classes=model_cfg.num_classes)
eval_loader = Loader(ds_eval, per_host, cfg.data.max_boxes, shuffle=False,
                     host_id=proc_id, num_hosts=nproc)
ev = Evaluator(area_scale=model_cfg.image_size)
n_images = 0


def host_rows(x, n_valid):
    x = np.asarray(x)
    x = x.reshape((nproc, -1) + x.shape[1:])[:, :n_valid]
    return x.reshape((-1,) + x.shape[2:])


for eb, n_valid in eval_loader.batches_padded():
    gimages = globalize(eb.images, dshard)
    det = eval_step(state, gimages)
    gt_b, gt_l, gt_v, gt_c = multihost_utils.process_allgather(
        (eb.boxes, eb.labels, eb.valid, eb.crowd), tiled=True)
    det_np = types.SimpleNamespace(
        boxes=host_rows(det.boxes, n_valid),
        scores=host_rows(det.scores, n_valid),
        labels=host_rows(det.labels, n_valid),
        valid=host_rows(det.valid, n_valid))
    ev.add_batch(det_np, host_rows(gt_b, n_valid),
                 host_rows(gt_l, n_valid) - 1, host_rows(gt_v, n_valid),
                 gt_ignore=host_rows(gt_c, n_valid))
    n_images += det_np.boxes.shape[0]
emap = ev.voc()["mAP"]
print(f"EVAL proc={proc_id} images={n_images} map={emap:.6f}", flush=True)

# ---- multi-process CHECKPOINT save/restore (C18 "multi-host-safe", the
# config #5 failure-recovery contract): every process participates in one
# orbax save of the replicated post-step state, then restores it into a
# fresh template and must read back the exact params.
ckpt_dir = os.environ.get("SBD_TEST_CKPT_DIR", "")
if ckpt_dir:
    from shape_based_object_detection_tpu.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt_dir, async_save=False)
    mgr.save(state, step=1)
    template = jax.device_put(
        train_lib.create_train_state(module, variables, cfg), rshard)
    restored = mgr.restore_latest(template)
    assert restored is not None, "restore_latest found nothing after save"
    r_checksum = float(sum(np.abs(np.asarray(jax.device_get(l))).sum()
                           for l in jax.tree_util.tree_leaves(
                               restored.params)))
    match = abs(r_checksum - checksum) < 1e-6 * max(1.0, abs(checksum))
    print(f"CKPT proc={proc_id} step={int(restored.step)} "
          f"match={int(match)} checksum={r_checksum:.6f}", flush=True)
    mgr.close()

jax.distributed.shutdown()
