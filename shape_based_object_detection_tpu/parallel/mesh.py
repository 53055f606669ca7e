"""Device mesh + shardings for data-parallel training (BASELINE config #5).

TPU-native scaling: a ``jax.sharding.Mesh`` over ('data', 'model'), batch
arrays sharded over 'data', params replicated. Gradients are averaged by XLA
— ``jit`` with these shardings inserts the all-reduce over ICI within a slice
and DCN across hosts; there is no hand-written collective in the hot path
(the reference's NCCL/DataParallel analog is this compiler-inserted psum).

The 'model' axis is kept in the mesh shape so tensor-parallel sharding is a
config change (MeshConfig.model_parallelism), not a rewrite; detection models
at this scale run with model_parallelism=1.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from shape_based_object_detection_tpu.config import MeshConfig


def make_mesh(
    devices: Optional[Sequence] = None,
    cfg: MeshConfig = MeshConfig(),
) -> Mesh:
    """Mesh over all devices: ('data', 'model') with model axis size
    cfg.model_parallelism (default 1 -> pure DP)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    mp = max(1, cfg.model_parallelism)
    assert n % mp == 0, f"{n} devices not divisible by model_parallelism={mp}"
    arr = np.asarray(devices).reshape(n // mp, mp)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def make_mesh_for_batch(
    global_batch: int,
    devices: Optional[Sequence] = None,
    cfg: MeshConfig = MeshConfig(),
) -> Mesh:
    """Mesh whose data axis divides the GLOBAL batch size.

    Single-process, a global batch smaller than (or not divisible by) the
    device count shrinks the data axis to the largest divisor — useful for
    tiny batches on the 8-virtual-device test mesh. Multi-process, shrinking
    would drop whole hosts' devices from the mesh (jax.devices() is
    process-grouped, so a truncated mesh can leave some processes owning
    zero devices while their collectives hang) — there it is an error."""
    if devices is None:
        devices = jax.devices()
    mp = max(1, cfg.model_parallelism)
    if len(devices) % mp != 0:
        # flooring here would silently idle devices (and, multi-host, could
        # exclude whole processes from the mesh — the collective-hang hazard
        # the batch-shrink path below raises for)
        raise ValueError(
            f"model_parallelism={mp} does not divide the device count "
            f"{len(devices)}")
    n_data = len(devices) // mp
    if global_batch % n_data != 0:
        if jax.process_count() > 1:
            raise ValueError(
                f"global batch {global_batch} is not divisible by the data-"
                f"axis size {n_data} ({len(devices)} devices / "
                f"model_parallelism={mp}); adjust data.batch_size — the mesh "
                "cannot be shrunk across processes")
        while n_data > 1 and global_batch % n_data != 0:
            n_data -= 1
    return make_mesh(list(devices)[: n_data * mp], cfg)


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Leading batch dim sharded over the data axis."""
    return NamedSharding(mesh, P(cfg.data_axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spatial_image_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()
                           ) -> NamedSharding:
    """NHWC images: batch over 'data' AND image rows (H) over 'model'.

    This is the large-resolution scaling lever (BASELINE config #5, 1024px):
    sharding the spatial axis divides per-device activation memory by the
    model-axis size. XLA's GSPMD spatial partitioning inserts the halo
    exchanges the convolutions need automatically — same train_step program,
    zero hand-written communication (the CNN analog of sequence parallelism;
    there is no sequence axis in a detector, SURVEY.md §5).
    """
    return NamedSharding(mesh, P(cfg.data_axis, cfg.model_axis))


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> None:
    """Multi-host bring-up (config #5). On a real pod the three args come from
    the scheduler; on single-host this is a no-op."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
