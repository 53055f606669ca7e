"""Platform-selection helper for entry points.

The axon TPU platform plugin overrides the ``JAX_PLATFORMS`` env var at
import, so the stock-JAX recipe ``JAX_PLATFORMS=cpu python ...`` silently
creates a real TPU client (and hangs whenever the tunnel is flaky).
Entry-point processes (CLIs, examples, tools) call
:func:`honor_jax_platforms_env` before any backend use to restore stock
semantics: the env var, when set, wins.
"""

from __future__ import annotations

import os


def honor_jax_platforms_env() -> None:
    """Mirror a set JAX_PLATFORMS env var into the jax config (no-op when
    unset or when it already matches, e.g. the driver's axon default)."""
    value = os.environ.get("JAX_PLATFORMS")
    if value:
        import jax

        jax.config.update("jax_platforms", value)


def use_pallas_default() -> bool:
    """Backend policy shared by every 'auto'-backend op (NMS, matching):
    compiled Pallas kernels on TPU, interpret/jnp fallbacks elsewhere."""
    import jax

    return jax.default_backend() == "tpu"
