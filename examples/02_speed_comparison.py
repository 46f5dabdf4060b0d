"""The reference's headline speed benchmark, TPU-style.

The reference compares pure Python (5.83 s), numba (33.3 ms) and Fortran
(23.7 ms) on 10M ABC-model timesteps
(``docs/source/examples/speed_comparision.rst``).  Here the same
simulation runs two TPU-native ways -- the MXU Toeplitz-matmul linear
scan and the single-program Pallas kernel with in-kernel DMA double
buffering -- and as a batched ensemble, which is where an accelerator
actually earns its keep.

Timing methodology: a single dispatch carries a fixed ~28 ms host-device
round-trip on tunneled runtimes, so each engine chains many dependent
simulations inside ONE jitted program (nonlinear feedback of the full
output -- nothing can be hoisted or cached) and divides by the count.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from rrmpg_tpu.ops import run_abcmodel_matscan
from rrmpg_tpu.utils.profiling import benchmark

NUMBA_MS = 33.3

# CI fast mode (tests/test_examples.py): tiny sizes so the example
# executes end-to-end in seconds; the benchmark sizes are the defaults.
FAST = os.environ.get("RRMPG_EXAMPLE_FAST") == "1"


def timed_chain(kernel, prec, params, reps):
    """Best-of-3 amortized per-simulation time for a chained kernel."""
    def many(p, seed):
        def body(i, carry):
            acc, pp = carry
            q, s = kernel(pp, 0.0, params)
            return (acc + s[-1], jnp.sqrt(jnp.abs(q) + 0.5 + seed * 1e-9))
        acc, pp = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), p))
        return acc + pp[0]

    fn = jax.jit(many)
    t0 = time.perf_counter()
    float(fn(prec, jnp.float32(0)))
    compile_s = time.perf_counter() - t0
    best = float('inf')
    for k in range(1, 4):
        t0 = time.perf_counter()
        float(fn(prec, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    return compile_s, best / reps


def main():
    T = 500_000 if FAST else 10_000_000
    rng = np.random.default_rng(0)
    prec = jnp.asarray(rng.uniform(0, 20, T), jnp.float32)
    params = {'a': jnp.float32(0.3), 'b': jnp.float32(0.2),
              'c': jnp.float32(0.15)}
    on_tpu = jax.devices()[0].platform == "tpu"
    reps = 2 if FAST else 256 if on_tpu else 4

    engines = {"Toeplitz/MXU matscan": run_abcmodel_matscan}
    if on_tpu:
        from rrmpg_tpu.ops.pallas_linear_scan import abc_fused_single_pallas
        engines["Pallas single-program (DMA pipelined)"] = (
            lambda p, s0, pa: abc_fused_single_pallas(p, s0, pa,
                                                      rows=2048))

    for name, kernel in engines.items():
        compile_s, per = timed_chain(kernel, prec, params, reps)
        print(f"ABC 10M steps [{name}]: compile {compile_s:.1f}s, "
              f"{per * 1e3:.3f} ms/sim = {T / per:.3e} steps/s "
              f"({NUMBA_MS / (per * 1e3):.0f}x numba, {reps} chained)")

    # Ensemble version: 1024 parameter sets over 1M steps each.
    N, T_e = (64, 50_000) if FAST else (1024, 1_000_000)
    prec_e = jnp.asarray(rng.uniform(0, 20, T_e), jnp.float32)
    batch = {k: jnp.asarray(rng.uniform(0.05, 0.45, N), jnp.float32)
             for k in ('a', 'b', 'c')}
    fn_e = jax.jit(jax.vmap(
        lambda p: run_abcmodel_matscan(prec_e, 0.0, p)[0]))
    res_e = benchmark(fn_e, batch, repeats=3)
    print(f"ABC ensemble {N}x{T_e}: best {res_e.best_s * 1e3:.1f} ms "
          f"({res_e.throughput(N * T_e):.3e} catchment-steps/s)")


if __name__ == "__main__":
    main()
