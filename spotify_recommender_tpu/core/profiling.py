"""Tracing / profiling utilities.

The reference has zero instrumentation (its performance numbers are
hand-stated docs claims — SURVEY.md §5/§6).  Here:

- `trace()` context manager around `jax.profiler` for TensorBoard-viewable
  device traces;
- `annotate()` for named trace spans inside host code;
- `timed()` — wall-clock timing with `block_until_ready` fencing, the only
  honest way to time async-dispatched JAX computations.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Iterator, Tuple

import jax

from spotify_recommender_tpu.core.logging import get_logger

log = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in TensorBoard / XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("trace written to %s", log_dir)


def annotate(name: str):
    """Named span that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs
          ) -> Tuple[float, Any]:
    """(median_seconds, last_output) with block_until_ready fencing."""
    out = None
    for _ in range(max(1, warmup)):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out
