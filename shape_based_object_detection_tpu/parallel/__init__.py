"""SPMD parallelism: device mesh, shardings, multi-host init (SURVEY.md §2)."""

from shape_based_object_detection_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    spatial_image_sharding,
    initialize_multihost,
)
