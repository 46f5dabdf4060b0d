"""Benchmark harness.

Headline metric: the reference's own published speed benchmark -- the ABC
model over 10 million timesteps (``docs/source/examples/
speed_comparision.rst:199-263``: pure Python 5.83 s, numba 33.3 ms
~= 3.0e8 timesteps/s on one CPU core, Fortran 23.7 ms).

On TPU the linear storage recurrence runs as hierarchical Toeplitz
matmuls on the MXU (see ``rrmpg_tpu/ops/linear_scan.py``) instead of a
10M-step sequential loop.  Timing amortizes per-dispatch overhead with an
on-device ``fori_loop`` over independent repeats (the production regime --
ensembles/calibration -- keeps the device busy inside one program the same
way).  ``vs_baseline`` is the ratio of our timesteps/s to the numba
single-core baseline.

Secondary number (stderr): batched-ensemble Monte-Carlo throughput for
GR4J in catchment-timesteps/s.

Prints exactly ONE JSON line to stdout.
"""

import json
import sys
import time

import numpy as np

NUMBA_BASELINE_STEPS_PER_S = 10_000_000 / 33.3e-3  # 3.0e8, 1 CPU core


def bench_abc_10m(repeats_inner=None):
    """Time the headline 10M-step ABC simulation.

    Two engines are measured -- the XLA hierarchical-Toeplitz scan and the
    single-program Pallas kernel with in-kernel DMA double buffering -- and
    the faster one is reported.  ``repeats_inner`` simulations are chained
    inside ONE jitted program so that fixed per-invocation dispatch cost
    (~28 ms through the remote-TPU tunnel of this environment; absent on a
    directly attached chip) amortizes out of the per-simulation time.
    """
    import jax
    import jax.numpy as jnp

    from rrmpg_tpu.ops.abc import run_abcmodel_matscan

    platform = jax.devices()[0].platform
    explicit_repeats = repeats_inner is not None
    if repeats_inner is None:
        repeats_inner = 1024 if platform == "tpu" else 4

    T = 10_000_000
    rng = np.random.default_rng(0)
    prec = jnp.asarray(rng.uniform(0, 20, T), dtype=jnp.float32)
    params = {'a': jnp.float32(0.3), 'b': jnp.float32(0.2),
              'c': jnp.float32(0.15)}

    def chained(kernel, reps):
        # Chain repeats through an elementwise-NONLINEAR feedback of the
        # full output.  This is load-bearing twice over: (1) the ABC model
        # is linear, so scalar perturbations or linear reductions let XLA
        # hoist the Toeplitz matmuls out of the loop (measured "1900x"
        # fictions); sqrt(|q|) feedback forces every simulation to be
        # computed; (2) the remote runtime caches identical
        # (program, input) executions, so every repeat must see new data.
        def many(prec, seed):
            def body(i, carry):
                acc, p = carry
                q, s = kernel(p, 0.0, params)
                p_next = jnp.sqrt(jnp.abs(q) + 0.5 + seed * 1e-9)
                return (acc + s[-1], p_next)
            acc, p = jax.lax.fori_loop(0, reps, body,
                                       (jnp.float32(0), prec))
            return acc + p[0]
        return jax.jit(many)

    # The Pallas kernel (headline engine) runs first and with the full
    # chain; the XLA matscan's graph occasionally compiles very slowly
    # (~7 min observed once on the remote service), so its comparison
    # line uses a shorter chain -- it only needs to show the ordering.
    matscan_reps = (repeats_inner if explicit_repeats
                    else max(repeats_inner // 8, 1))
    engines = [("xla-matscan", run_abcmodel_matscan, matscan_reps)]
    if platform == "tpu":
        from rrmpg_tpu.ops.pallas_linear_scan import abc_fused_single_pallas
        engines.insert(0, (
            "pallas-single",
            lambda p, s0, par: abc_fused_single_pallas(p, s0, par,
                                                       rows=2048),
            repeats_inner))

    results = {}
    for name, kernel, reps in engines:
        fn = chained(kernel, reps)
        try:
            float(fn(prec, jnp.float32(0)))  # compile + cache-buster seed
        except Exception as e:
            print(f"[bench] ABC engine {name} failed: {e}", file=sys.stderr)
            continue
        best = float('inf')
        for k in range(1, 4):
            t0 = time.perf_counter()
            float(fn(prec, jnp.float32(k)))
            best = min(best, time.perf_counter() - t0)
        results[name] = best / reps
        print(f"[bench] ABC 10M steps [{name}]: "
              f"{results[name] * 1e3:.3f} ms/sim "
              f"({T / results[name]:.3e} steps/s, "
              f"{reps} chained)", file=sys.stderr)

    if not results:
        raise RuntimeError(
            "Every ABC benchmark engine failed; see the stderr lines "
            "above for the underlying errors.")
    name, per_sim = min(results.items(), key=lambda kv: kv[1])
    return T / per_sim, per_sim, name


def bench_gr4j_mc_pallas(num_params=131072, T=3651, repeats_inner=8):
    """Fused Pallas Monte-Carlo objective throughput (the production MC /
    calibration path): per-generation losses with zero trajectory HBM
    traffic.  Timed as chained evaluations inside one device program."""
    import jax
    import jax.numpy as jnp

    from rrmpg_tpu.ops.pallas_gr4j import gr4j_ensemble_mse_pallas

    rng = np.random.default_rng(1)
    prec = jnp.asarray(rng.uniform(0, 15, T), jnp.float32)
    etp = jnp.asarray(rng.uniform(0, 4, T), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, T), jnp.float32)
    params = {
        'x1': jnp.asarray(rng.uniform(100, 1200, num_params), jnp.float32),
        'x2': jnp.asarray(rng.uniform(-5, 3, num_params), jnp.float32),
        'x3': jnp.asarray(rng.uniform(20, 300, num_params), jnp.float32),
        'x4': jnp.asarray(rng.uniform(1.1, 2.9, num_params), jnp.float32),
    }

    @jax.jit
    def many(params):
        def body(i, acc):
            p2 = dict(params, x2=params['x2'] + acc * 1e-12 + i * 1e-7)
            losses = gr4j_ensemble_mse_pallas(prec, etp, qobs, 0.3, 0.3,
                                              p2, num_uh1=3, num_uh2=7)
            return acc + losses[0]
        return jax.lax.fori_loop(0, repeats_inner, body, jnp.float32(0))

    jax.block_until_ready(many(params))
    best = float('inf')
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(many(params))
        best = min(best, time.perf_counter() - t0)
    per = best / repeats_inner
    return num_params * T / per, num_params / per, per


def bench_snowgr4j_mc_pallas(num_params=131072, T=3651, layers=5,
                             repeats_inner=4):
    """Flagship CemaneigeHystGR4JIce fused MC objective throughput (the
    workload of the reference's headline hysteresis/ice-melt tutorial,
    ``Tutorial_Hysteresis_IceMelt.rst:204-209``): 5-layer hyst+ice snow
    composition + GR4J, one float per member to HBM."""
    import jax
    import jax.numpy as jnp

    from rrmpg_tpu.ops.pallas_snow import snowgr4j_ensemble_mse_pallas

    rng = np.random.default_rng(2)
    prec = jnp.asarray(rng.uniform(0, 15, (T, layers)), jnp.float32)
    temp = jnp.asarray(rng.uniform(-10, 15, (T, layers)), jnp.float32)
    fsol = jnp.asarray(rng.uniform(0, 1, (T, layers)), jnp.float32)
    etp = jnp.asarray(rng.uniform(0, 4, T), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, T), jnp.float32)
    frac_ice = jnp.asarray(rng.uniform(0, 0.5, layers), jnp.float32)
    params = {
        'CTG': jnp.asarray(rng.uniform(0, 1, num_params), jnp.float32),
        'Kf': jnp.asarray(rng.uniform(0, 6, num_params), jnp.float32),
        'Thacc': jnp.asarray(rng.uniform(5, 50, num_params), jnp.float32),
        'Rsp': jnp.asarray(rng.uniform(0.1, 1, num_params), jnp.float32),
        'x1': jnp.asarray(rng.uniform(100, 1200, num_params), jnp.float32),
        'x2': jnp.asarray(rng.uniform(-5, 3, num_params), jnp.float32),
        'x3': jnp.asarray(rng.uniform(20, 300, num_params), jnp.float32),
        'x4': jnp.asarray(rng.uniform(1.1, 2.9, num_params), jnp.float32),
        'DDF': jnp.asarray(rng.uniform(1, 10, num_params), jnp.float32),
    }

    @jax.jit
    def many(params, seed):
        def body(i, acc):
            p2 = dict(params, x2=params['x2'] + acc * 1e-12 + i * 1e-7 +
                      seed * 1e-9)
            losses = snowgr4j_ensemble_mse_pallas(
                prec, temp, etp, fsol, qobs, 0.0, 0.0, 0.3, 0.3, p2,
                frac_ice=frac_ice, hyst=True, ice=True, num_uh1=3,
                num_uh2=7)
            return acc + losses[0]
        return jax.lax.fori_loop(0, repeats_inner, body, jnp.float32(0))

    float(many(params, jnp.float32(0)))
    best = float('inf')
    for k in range(1, 3):
        t0 = time.perf_counter()
        float(many(params, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    per = best / repeats_inner
    return num_params * T / per, num_params / per, per


def bench_hbv_mc_pallas(num_params=131072, T=3651, repeats_inner=8):
    """Fused HBV-Edu MC objective throughput."""
    import jax
    import jax.numpy as jnp

    from rrmpg_tpu.ops.pallas_hbv import hbv_ensemble_mse_pallas

    rng = np.random.default_rng(3)
    temp = jnp.asarray(rng.uniform(-10, 20, T), jnp.float32)
    prec = jnp.asarray(rng.uniform(0, 15, T), jnp.float32)
    month = rng.integers(0, 12, T)
    pe_m = jnp.asarray(rng.uniform(1, 4, 12), jnp.float32)
    t_m = jnp.asarray(rng.uniform(-5, 15, 12), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, T), jnp.float32)
    params = {k: jnp.asarray(rng.uniform(*r, num_params), jnp.float32)
              for k, r in {
                  'T_t': (-2, 2), 'DD': (0.5, 5), 'FC': (50, 500),
                  'Beta': (1, 6), 'C': (0.01, 0.1), 'PWP': (30, 300),
                  'K_0': (0.1, 0.8), 'K_1': (0.05, 0.4),
                  'K_2': (0.01, 0.2), 'K_p': (0.01, 0.1),
                  'L': (1, 10)}.items()}

    @jax.jit
    def many(params, seed):
        def body(i, acc):
            p2 = dict(params, T_t=params['T_t'] + acc * 1e-12 + i * 1e-7
                      + seed * 1e-9)
            losses = hbv_ensemble_mse_pallas(temp, prec, month, pe_m,
                                             t_m, qobs, 2.0, 100.0, 5.0,
                                             5.0, p2)
            return acc + losses[0]
        return jax.lax.fori_loop(0, repeats_inner, body, jnp.float32(0))

    float(many(params, jnp.float32(0)))
    best = float('inf')
    for k in range(1, 3):
        t0 = time.perf_counter()
        float(many(params, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    per = best / repeats_inner
    return num_params * T / per, num_params / per, per


def bench_gr4j_regional_pallas(C=8, num_params=131072, T=3651,
                               repeats_inner=3):
    """Fused regional (catchment x member) MC objective throughput."""
    import jax
    import jax.numpy as jnp

    from rrmpg_tpu.ops.pallas_gr4j import gr4j_regional_mse_pallas

    rng = np.random.default_rng(1)
    prec = jnp.asarray(rng.uniform(0, 15, (C, T)), jnp.float32)
    etp = jnp.asarray(rng.uniform(0, 4, (C, T)), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, (C, T)), jnp.float32)
    params = {
        'x1': jnp.asarray(rng.uniform(100, 1200, num_params), jnp.float32),
        'x2': jnp.asarray(rng.uniform(-5, 3, num_params), jnp.float32),
        'x3': jnp.asarray(rng.uniform(20, 300, num_params), jnp.float32),
        'x4': jnp.asarray(rng.uniform(1.1, 2.9, num_params), jnp.float32),
    }

    @jax.jit
    def many(params, seed):
        def body(i, acc):
            p2 = dict(params, x2=params['x2'] + acc * 1e-12 + i * 1e-7 +
                      seed * 1e-9)
            losses = gr4j_regional_mse_pallas(prec, etp, qobs, 0.3, 0.3,
                                              p2, num_uh1=3, num_uh2=7)
            return acc + losses[0, 0]
        return jax.lax.fori_loop(0, repeats_inner, body, jnp.float32(0))

    float(many(params, jnp.float32(0)))
    best = float('inf')
    for k in range(1, 3):
        t0 = time.perf_counter()
        float(many(params, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    per = best / repeats_inner
    return C * num_params * T / per, per


def bench_gr4j_ensemble(num_params=16384, T=3651):
    import jax
    import jax.numpy as jnp

    from rrmpg_tpu.ops import run_gr4j

    rng = np.random.default_rng(1)
    prec = jnp.asarray(rng.uniform(0, 15, T), dtype=jnp.float32)
    etp = jnp.asarray(rng.uniform(0, 4, T), dtype=jnp.float32)
    params = {
        'x1': jnp.asarray(rng.uniform(100, 1200, num_params), jnp.float32),
        'x2': jnp.asarray(rng.uniform(-5, 3, num_params), jnp.float32),
        'x3': jnp.asarray(rng.uniform(20, 300, num_params), jnp.float32),
        'x4': jnp.asarray(rng.uniform(1.1, 2.9, num_params), jnp.float32),
    }

    fn = jax.jit(jax.vmap(lambda p: run_gr4j(prec, etp, 0.3, 0.3, p)[0]))
    jax.block_until_ready(fn(params))
    best = float('inf')
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params))
        best = min(best, time.perf_counter() - t0)
    return num_params * T / best, num_params / best, best


def main():
    import jax

    if "--scaling" in sys.argv:
        # Delegate to the scaling-efficiency harness (MC + DE throughput
        # at 1/2/4/... devices; see benchmarks/scaling.py).
        sys.argv.remove("--scaling")
        from benchmarks.scaling import main as scaling_main
        scaling_main()
        return

    platform = jax.devices()[0].platform
    abc_steps_per_s, abc_dt, abc_engine = bench_abc_10m()
    print(f"[bench] ABC 10M steps best [{abc_engine}]: {abc_dt * 1e3:.3f} ms "
          f"({abc_steps_per_s:.3e} steps/s) on {platform}", file=sys.stderr)

    try:
        gr4j_ct_per_s, gr4j_sets_per_s, gr4j_dt = bench_gr4j_ensemble()
        print(f"[bench] GR4J ensemble 16384x3651 (XLA): "
              f"{gr4j_dt * 1e3:.1f} ms "
              f"({gr4j_ct_per_s:.3e} catchment-timesteps/s, "
              f"{gr4j_sets_per_s:.3e} param-sets/s)", file=sys.stderr)
    except Exception as e:  # secondary metric must not break the headline
        print(f"[bench] GR4J ensemble failed: {e}", file=sys.stderr)

    if platform == "tpu":
        try:
            ct, sets, per = bench_gr4j_mc_pallas()
            print(f"[bench] GR4J MC 131072x3651 (Pallas fused): "
                  f"{per * 1e3:.1f} ms/eval ({ct:.3e} "
                  f"catchment-timesteps/s, {sets:.3e} param-sets/s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"[bench] Pallas MC failed: {e}", file=sys.stderr)
        try:
            ct, sets, per = bench_snowgr4j_mc_pallas()
            print(f"[bench] CemaneigeHystGR4JIce MC 131072x3651x5L "
                  f"(Pallas fused): {per * 1e3:.1f} ms/eval "
                  f"({ct:.3e} catchment-timesteps/s, {sets:.3e} "
                  f"param-sets/s)", file=sys.stderr)
        except Exception as e:
            print(f"[bench] Pallas snow MC failed: {e}", file=sys.stderr)
        try:
            ct, sets, per = bench_hbv_mc_pallas()
            print(f"[bench] HBV-Edu MC 131072x3651 (Pallas fused): "
                  f"{per * 1e3:.1f} ms/eval ({ct:.3e} "
                  f"catchment-timesteps/s, {sets:.3e} param-sets/s)",
                  file=sys.stderr)
        except Exception as e:
            print(f"[bench] Pallas HBV MC failed: {e}", file=sys.stderr)
        try:
            ct, per = bench_gr4j_regional_pallas()
            print(f"[bench] GR4J regional MC 8x131072x3651 (Pallas "
                  f"fused): {per * 1e3:.1f} ms/eval ({ct:.3e} "
                  f"catchment-timesteps/s; the vmapped XLA path cannot "
                  f"fit this size on one chip)", file=sys.stderr)
        except Exception as e:
            print(f"[bench] Pallas regional MC failed: {e}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "ABC-model 10M-timestep throughput (reference headline "
                  "benchmark, speed_comparision.rst)",
        "value": round(abc_steps_per_s, 1),
        "unit": "timesteps/s",
        "vs_baseline": round(abc_steps_per_s / NUMBA_BASELINE_STEPS_PER_S,
                             3),
    }))


if __name__ == "__main__":
    main()
