"""Training observability: throughput meters, step timers, profiler traces.

The reference has no tracing/metrics at all (SURVEY.md §5.1/§5.5 — tqdm
bars and prints only).  Here:

- ``ThroughputMeter`` tracks iters/s, rays/s and samples/s over a sliding
  window (the README-table metrics, `reference README.md:112-121`);
- ``trace`` wraps a code region in a jax.profiler trace for TensorBoard;
- ``StepTimer`` names device-synchronized phases inside a step loop;
- ``FileLogger`` mirrors the mipnerf contrib's loss.txt file logging
  (`contrib/mipnerf/.../utils/logs.py`).
"""

from __future__ import annotations

import collections
import contextlib
import logging
import time


class ThroughputMeter:
    def __init__(self, window: int = 100):
        self.times = collections.deque(maxlen=window)
        self.rays = collections.deque(maxlen=window)
        self.samples = collections.deque(maxlen=window)
        self._last = None

    def tick(self, n_rays: int = 0, n_samples: int = 0):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            self.rays.append(n_rays)
            self.samples.append(n_samples)
        self._last = now

    @property
    def iters_per_s(self):
        t = sum(self.times)
        return len(self.times) / t if t else 0.0

    @property
    def rays_per_s(self):
        t = sum(self.times)
        return sum(self.rays) / t if t else 0.0

    @property
    def samples_per_s(self):
        t = sum(self.times)
        return sum(self.samples) / t if t else 0.0

    def summary(self) -> str:
        return (f"{self.iters_per_s:.1f} it/s | "
                f"{self.rays_per_s/1e3:.0f} krays/s | "
                f"{self.samples_per_s/1e6:.1f} Msamples/s")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a region; view in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named wall-clock phases with device sync at boundaries."""

    def __init__(self):
        self.totals = collections.defaultdict(float)
        self.counts = collections.defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync_value=None):
        t0 = time.perf_counter()
        yield
        if sync_value is not None:
            import jax

            jax.block_until_ready(sync_value)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        return " | ".join(
            f"{k}: {1e3*v/max(self.counts[k],1):.1f}ms"
            for k, v in sorted(self.totals.items())
        )


def get_log(path: str) -> logging.Logger:
    """File+console logger (parity: mipnerf contrib's get_log)."""
    logger = logging.getLogger(path)
    if not logger.handlers:
        logger.setLevel(logging.INFO)
        fh = logging.FileHandler(path)
        fh.setFormatter(logging.Formatter("%(asctime)s %(message)s"))
        logger.addHandler(fh)
        sh = logging.StreamHandler()
        logger.addHandler(sh)
    return logger
