"""Profiling and throughput observability.

The reference's only performance instrumentation is wall-clock prints
(``conv_ae_model.py:336-341``, ``unet.py:306-330``); per SURVEY.md §5 the
rebuild promotes this to a first-class module:

 * :class:`ThroughputMeter` — windowed images/sec (and steps/sec) counters;
   the train loop records one window per compiled epoch-span.
 * :func:`trace` — context manager around ``jax.profiler`` emitting a
   TensorBoard-loadable trace directory (set ``CAE_TPU_PROFILE=<dir>`` to
   trace any training run without code changes).
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field


@dataclass
class ThroughputMeter:
    name: str = "train"
    windows: list = field(default_factory=list)  # (images, steps, seconds)

    def record(self, images: int, steps: int, seconds: float):
        self.windows.append((images, steps, seconds))

    @contextlib.contextmanager
    def measure(self, images: int, steps: int = 1):
        t0 = time.perf_counter()
        yield
        self.record(images, steps, time.perf_counter() - t0)

    @property
    def total_images(self):
        return sum(w[0] for w in self.windows)

    @property
    def total_seconds(self):
        return sum(w[2] for w in self.windows)

    def images_per_sec(self, skip_first: bool = True) -> float:
        """Steady-state throughput; the first window holds compile time."""
        windows = self.windows[1:] if skip_first and len(self.windows) > 1 else self.windows
        secs = sum(w[2] for w in windows)
        imgs = sum(w[0] for w in windows)
        return imgs / secs if secs > 0 else 0.0

    def summary(self) -> dict:
        return {
            "name": self.name,
            "windows": len(self.windows),
            "total_images": self.total_images,
            "total_seconds": round(self.total_seconds, 4),
            "images_per_sec": round(self.images_per_sec(), 2),
        }


@contextlib.contextmanager
def trace(log_dir=None):
    """Profile the enclosed block with jax.profiler (TensorBoard format).

    If ``log_dir`` is None, uses ``$CAE_TPU_PROFILE`` or no-ops.
    """
    log_dir = log_dir or os.environ.get("CAE_TPU_PROFILE")
    if not log_dir:
        yield None
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
