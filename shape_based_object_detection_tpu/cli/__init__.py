"""Thin argparse wrappers over the library API (SURVEY.md §1 entry layer).

CLI processes honor the JAX_PLATFORMS env var (utils/platform.py): the
platform plugin in this environment overrides it at import, which would
make the documented `JAX_PLATFORMS=cpu python -m ...train_cli` silently
create a real TPU client.
"""

from shape_based_object_detection_tpu.utils.platform import (
    honor_jax_platforms_env,
)

honor_jax_platforms_env()
