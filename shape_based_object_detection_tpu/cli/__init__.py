"""Thin argparse wrappers over the library API (SURVEY.md §1 entry layer)."""

import os

# Make the JAX_PLATFORMS env var actually govern CLI processes: the axon
# platform plugin overrides the env var at import, so a documented
# `JAX_PLATFORMS=cpu python -m ...train_cli` would silently create a real
# TPU client (and hang whenever the tunnel is flaky). Mirroring the env var
# into the config before any backend use restores stock JAX semantics;
# under the driver's JAX_PLATFORMS=axon this is a no-op.
if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
