"""Profiling and debugging hooks (SURVEY.md §5).

* ``trace(dir)`` — context manager around ``jax.profiler`` for
  TensorBoard/XProf captures of training steps.
* ``annotate(name)`` — named trace region for per-layer attribution.
* ``enable_nan_debugging()`` — turns on jax_debug_nans (the reference has no
  equivalent; closest TPU analogue of sanitizers for this workload).
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Decorator/context manager: named region in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


def enable_nan_debugging(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)
