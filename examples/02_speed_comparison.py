"""The reference's headline speed benchmark, TPU-style.

The reference compares pure Python (5.83 s), numba (33.3 ms) and Fortran
(23.7 ms) on 10M ABC-model timesteps
(``docs/source/examples/speed_comparision.rst``).  Here the same
simulation runs three ways: sequential ``lax.scan``, parallel-prefix
``associative_scan``, and the MXU Toeplitz-matmul linear scan -- and as a
batched ensemble, which is where an accelerator actually earns its keep.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rrmpg_tpu.ops import run_abcmodel_matscan
from rrmpg_tpu.utils.profiling import benchmark


def main():
    T = 10_000_000
    rng = np.random.default_rng(0)
    prec = jnp.asarray(rng.uniform(0, 20, T), jnp.float32)
    params = {'a': jnp.float32(0.3), 'b': jnp.float32(0.2),
              'c': jnp.float32(0.15)}

    fn = jax.jit(lambda p: run_abcmodel_matscan(p, 0.0, params))
    res = benchmark(fn, prec, repeats=3)
    # Note: a single dispatch carries ~30 ms of host-device round-trip on
    # tunneled runtimes; bench.py amortizes this inside one device program
    # (device compute is ~2-3 ms for the 10M-step simulation).
    print(f"ABC 10M steps (Toeplitz/MXU): compile {res.compile_s:.1f}s, "
          f"best {res.best_s * 1e3:.2f} ms "
          f"({res.throughput(T):.3e} steps/s; numba reference: 33.3 ms)")

    # Ensemble version: 1024 parameter sets over 1M steps each.
    N, T_e = 1024, 1_000_000
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
