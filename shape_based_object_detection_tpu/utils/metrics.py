"""Metrics / logging / observability (component C20, SURVEY.md §5).

The reference prints per-iter losses with tqdm meters; here train_step returns
a metrics dict (loss terms, grad norm, #positives) and the host-side logger
keeps running averages, throughput (the north-star images/sec/chip counter),
and optionally mirrors scalars to TensorBoard via the installed TF.
"""

from __future__ import annotations

import collections
import json
import time
from typing import Dict, Mapping, Optional

import numpy as np


class AverageMeter:
    def __init__(self, window: int = 100):
        self.values = collections.deque(maxlen=window)

    def update(self, v: float) -> None:
        self.values.append(float(v))

    @property
    def avg(self) -> float:
        return float(np.mean(self.values)) if self.values else 0.0


class MetricsLogger:
    def __init__(self, log_every: int = 50, tensorboard_dir: Optional[str] = None):
        self.log_every = log_every
        self.meters: Dict[str, AverageMeter] = collections.defaultdict(AverageMeter)
        self._t0 = time.perf_counter()
        self._images_since_log = 0
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception:
                self._tb = None

    def update(self, step: int, metrics: Mapping[str, object],
               batch_size: int = 0) -> Optional[str]:
        """Feed one step's metrics; returns a log line every log_every steps."""
        for k, v in metrics.items():
            try:
                self.meters[k].update(float(np.asarray(v)))
            except (TypeError, ValueError):
                continue
        self._images_since_log += batch_size
        if step % self.log_every != 0:
            return None
        dt = time.perf_counter() - self._t0
        ips = self._images_since_log / dt if dt > 0 else 0.0
        parts = [f"step {step}"] + [
            f"{k}={m.avg:.4f}" for k, m in sorted(self.meters.items())
        ]
        if batch_size:
            parts.append(f"img/s={ips:.1f}")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, m in self.meters.items():
                    tf.summary.scalar(k, m.avg, step=step)
                if batch_size:
                    tf.summary.scalar("images_per_sec", ips, step=step)
        self._t0 = time.perf_counter()
        self._images_since_log = 0
        return "  ".join(parts)


def benchmark_fn(fn, *args, warmup: int = 3, iters: int = 10) -> Dict[str, float]:
    """block_until_ready timing harness (SURVEY.md §5 tracing/profiling)."""
    import jax

    if warmup:
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return {"seconds_per_call": dt, "calls_per_sec": 1.0 / dt}


def profile_trace(fn, *args, logdir: str = "/tmp/sbd_profile"):
    """Capture an XProf/Perfetto trace of one call (SURVEY.md §5)."""
    import jax

    with jax.profiler.trace(logdir):
        out = fn(*args)
        jax.block_until_ready(out)
    return logdir
