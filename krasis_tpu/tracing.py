"""Profiling / tracing hooks (reference dump_trace.sh + TIMING analog).

* `capture_trace(dir)` — context manager around jax.profiler.trace;
  produces a TensorBoard-loadable / Perfetto trace of device activity
  (the TPU answer to the reference's py-spy/gdb stack dumper).
* `annotate(name)` — named region (jax.profiler.TraceAnnotation) so
  engine phases (prefill / decode / sample) are visible in the trace.
* `phase_timer` — env-gated (KRASIS_TPU_*_TIMING) wall-clock phase
  logger used by the engine when profiling is too heavy.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

from .timing import TIMING


@contextlib.contextmanager
def capture_trace(out_dir: str) -> Iterator[None]:
    import jax

    with jax.profiler.trace(out_dir):
        yield


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def phase_timer(name: str, enabled: bool = True) -> Iterator[None]:
    if not enabled:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        print(f"[timing] {name}: {(time.perf_counter() - t0) * 1e3:.2f} ms")
