"""Persistent XLA compilation cache (SURVEY.md §5 tracing/observability tier).

TPU compiles of the full detection graphs take tens of seconds; the tunneled
runtime makes cold compiles the dominant cost of short-lived processes
(benchmarks, CLIs, serving restarts). Enabling JAX's persistent compilation
cache makes every program after the first run load from disk in ~ms.

Call ``enable_compilation_cache()`` before the first jitted execution. Safe to
call multiple times; honors an explicit JAX_COMPILATION_CACHE_DIR env var.
"""

from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)

_configured_path: str | None = None


def _host_fingerprint() -> str:
    """Short hash of this host's CPU feature set.

    The JAX cache key does NOT cover the host CPU features baked into
    XLA:CPU AOT executables, and the cache directory can outlive one
    machine (shared filesystems, checkpointed containers). Loading a CPU
    executable AOT-compiled on a machine with a different feature set
    (e.g. AMX/AVX-512 variants) is at best a loud warning and at worst
    SILENT WRONG RESULTS — observed 2026-08-17 as an NMS mask computed
    incorrectly by a cache entry from a prior host ("+prefer-no-scatter is
    not supported on the host machine"). Namespacing the cache by a CPU
    fingerprint makes entries machine-compatible by construction; a new
    machine simply starts a fresh namespace.
    """
    # Note: even same-host cache hits log a spurious cpu_aot_loader E-line
    # ("+prefer-no-scatter is not supported on the host machine"): XLA bakes
    # its own tuning pseudo-features (prefer-no-scatter/gather) into the
    # compile-time feature list and then compares it against LLVM host
    # detection, which never reports them. Harmless when the REAL ISA
    # features match — which this fingerprint guarantees.
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{flags}"
    return hashlib.md5(key.encode()).hexdigest()[:10]


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on the on-disk XLA executable cache. Returns the directory used."""
    global _configured_path
    import jax

    base = cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    path = os.path.join(base, f"host-{_host_fingerprint()}")
    if path == _configured_path:
        return path
    # A repeat call with a DIFFERENT directory re-points the config (cheap);
    # returning a path jax isn't actually using would silently ignore it.
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: entry-size / compile-time floors default to skipping
    # small programs, but dispatch-heavy pipelines (prefetch, eval) re-pay
    # those compiles on every process start otherwise.
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _configured_path = path
    return path
