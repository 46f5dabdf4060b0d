"""Profiling and benchmarking helpers.

The reference's only performance tooling is a ``%timeit`` notebook
(``docs/source/examples/speed_comparision.rst``).  This module provides:

* :func:`trace` -- context manager around ``jax.profiler`` producing
  TensorBoard-loadable device traces;
* :func:`benchmark` -- robust wall-clock timing of jitted callables with
  compile/run separation and dispatch-overhead amortization via an
  on-device repeat loop (see BENCHMARKING.md notes in bench.py: repeated
  identical calls can be served from an execution cache on some runtimes,
  so amortized timing perturbs inputs inside one program).
"""

import contextlib
import time
import typing

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir):
    """Capture a device trace viewable in TensorBoard / Perfetto."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class BenchResult(typing.NamedTuple):
    compile_s: float   # first call (compile + run)
    best_s: float      # best steady-state wall time per call
    mean_s: float
    repeats: int

    def throughput(self, items: int) -> float:
        """items / best_s."""
        return items / self.best_s


def benchmark(fn, *args, repeats: int = 5, **kwargs) -> BenchResult:
    """Time a jittable callable: one compile call, then ``repeats`` runs."""
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return BenchResult(compile_s, float(np.min(times)),
                       float(np.mean(times)), repeats)
