"""Profiling / device observability.

TPU equivalents of the reference's closest mechanisms (SURVEY.md §5.1):
the Ignite ``GpuInfo`` progress-bar metric becomes
:func:`device_memory_summary`, the ``training_epoch_length`` short-
profiling-epoch idiom is complemented by a real ``jax.profiler`` trace:
set ``SYNTHANATOMY_PROFILE_DIR=/path`` (or pass ``profile_dir``) and
the first ``SYNTHANATOMY_PROFILE_STEPS`` (default 5) train steps of a
run are captured for xprof/tensorboard, with per-step
``StepTraceAnnotation`` markers.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax

__all__ = ["StepProfiler", "device_memory_summary"]


def device_memory_summary() -> Dict[str, float]:
    """Bytes-in-use / peak / limit of device 0 (MB) when the backend
    exposes memory_stats (TPU does; CPU returns {})."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        return {}
    mb = 1.0 / (1024 * 1024)
    out = {}
    for src, dst in (
        ("bytes_in_use", "Device-Memory-InUse-MB"),
        ("peak_bytes_in_use", "Device-Memory-Peak-MB"),
        ("bytes_limit", "Device-Memory-Limit-MB"),
    ):
        if src in stats:
            out[dst] = stats[src] * mb
    return out


class StepProfiler:
    """Trace the first N steps of a run when enabled.

    >>> prof = StepProfiler(profile_dir)   # None → env var → disabled
    >>> for step in ...:
    ...     with prof.step(step):
    ...         train_step(...)
    """

    def __init__(self, profile_dir: Optional[str] = None, num_steps: Optional[int] = None):
        self.dir = profile_dir or os.environ.get("SYNTHANATOMY_PROFILE_DIR")
        self.num_steps = num_steps or int(
            os.environ.get("SYNTHANATOMY_PROFILE_STEPS", "5")
        )
        self._active = False
        self._seen = 0

    def step(self, step_num: int):
        if self.dir is None:
            return jax.profiler.StepTraceAnnotation("train", step_num=step_num)
        if not self._active and self._seen == 0:
            jax.profiler.start_trace(self.dir)
            self._active = True
        self._seen += 1
        if self._active and self._seen > self.num_steps:
            jax.profiler.stop_trace()
            self._active = False
            self.dir = None
        return jax.profiler.StepTraceAnnotation("train", step_num=step_num)

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
