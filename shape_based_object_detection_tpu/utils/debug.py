"""Debug / sanitizer aids (SURVEY.md §5: the XLA-world analog of the
reference's nonexistent race detection — numerical sanitizers and trace
guards)."""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def nan_debug_mode():
    """Enable jax_debug_nans inside the scope: any NaN produced by a jitted
    computation raises immediately with a de-optimized re-run pinpointing the
    op. Use for debug runs only (disables async dispatch wins)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def assert_compiles_once(jitted_fn, *calls):
    """Call jitted_fn on every argument tuple in ``calls`` and assert the jit
    cache ends with exactly one entry (static-shape discipline, SURVEY.md §4
    item 3)."""
    for args in calls:
        out = jitted_fn(*args)
    jax.block_until_ready(out)
    n = jitted_fn._cache_size()
    assert n == 1, f"expected 1 compiled program, found {n} (shape leak?)"
    return out
