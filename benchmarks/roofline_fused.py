"""Roofline for the fused GR4J / snow-GR4J Pallas kernels.

The ABC headline kernel is HBM-bound (docs/performance.md); the fused
ensemble objective kernels are NOT -- they stream ~3 lane-replicated
forcing rows per step and keep every carry in VMEM, so their ceiling is
set by the VPU: how fast the (8, 128)-tile elementwise step program can
issue.  This harness measures that ceiling empirically on the attached
chip instead of trusting a paper cycle model:

1. **Per-op-class microbenchmarks.**  Synthetic Pallas kernels with the
   exact structure of the production kernels (grid ``(1, n_tt)``, inner
   ``fori_loop`` over ``t_tile`` steps, all state in VMEM scratch) whose
   body issues ``reps`` ops of one class.  Two ``reps`` values give a
   slope that cancels loop/bookkeeping overhead; a dependent chain
   measures latency-bound cost, ``chains=4`` independent chains measure
   throughput-bound cost.  Classes: cheap (mul+add), div, sqrt, rsqrt,
   tanh, UH shift-register slot (VMEM scratch load+FMA+store), and a
   lane-replicated forcing-row load.

2. **Static op census of the step functions.**  Counted from the
   CURRENT ``ops/pallas_gr4j.py:_gr4j_step`` and
   ``ops/pallas_snow.py:_snow_step_layer`` sources (reciprocal
   parameter rows, branchless rain/evap arms, chunk-8 MSE time loops)
   -- see ``gr4j_census`` / ``snow_layer_census`` below, one entry per
   vector op, keyed by class.  Re-count after any step-math change.

3. **Ceiling vs measurement.**  ideal time = tile-steps x
   sum(count_c * cost_c); report measured/ideal for the production
   configs (``bench.py``'s 131072 x 3651 MC objective and the 5-layer
   hyst+ice variant).  The dependent-chain costs give the
   pessimistic ("no ILP") bound, the independent-chain costs the
   optimistic ("perfect ILP") bound; the kernel's true floor lies
   between because the step math is a mostly-serial dependence chain
   per member tile.

Run on the TPU:  ``python benchmarks/roofline_fused.py``
(each measurement chains enough work that the ~28 ms tunnel dispatch is
<3% -- and op costs are slopes between two sizes, which cancels fixed
overhead exactly).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))  # repo root (CLAUDE.md: running files in benchmarks/
                  # puts benchmarks/ itself on sys.path, not the root)

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = (8, 128)


# ---------------------------------------------------------------------------
# Op census (counted from the kernel sources; one entry per vector op on an
# (8, 128) member tile per timestep).
# ---------------------------------------------------------------------------

def gr4j_census(num_uh1, num_uh2, mse=True):
    """Vector-op counts per timestep of ``_gr4j_step`` (+ MSE accumulate).

    Models the CURRENT production kernel (reciprocal parameter rows,
    branchless rain/evap arms, chunk-8 time loop in ``_mse_kernel``):
    only the two state-dependent denominators (p_s / e_s) remain true
    divides; 1/x1 and 1/x3 ride in as packed rows.

    cheap: add/sub/mul/min/max/cmp/select (1 VPU issue each)
    div / sqrt / rsqrt / tanh: transcendental-unit ops
    shift: UH register slot update ``uh[j] = uh[j+1] + oh[j]*pr``
           (VMEM scratch load + FMA + store; measured as its own class)
    load: dynamic-sublane forcing read from the VMEM series block.  In
          the chunked MSE kernel one (8, 128) load covers 8 steps, so
          the per-step count is 3/8; the static row extracts inside the
          chunk are counted as cheap.
    """
    c = {
        # production store: p_n/pe_n(4) sr(1) tanh args(2) p_s(6) e_s(6)
        # s_interim(2) z(4: 2 mul + pow4) perc(3) s_new(1) p_r(2)
        # pr1/pr2(2)
        "cheap": 4 + 1 + 2 + 6 + 6 + 2 + 4 + 3 + 1 + 2 + 2
        # routing: rx/rx2(2) gw(3) r_interim(3) z(3) q_r(3) r_new(1)
        # q_d(2) q(1)
        + 2 + 3 + 3 + 3 + 3 + 1 + 2 + 1,
        "div": 2,        # p_s, e_s denominators (state-dependent)
        "sqrt": 3,       # perc 1+z, sqrt(rx), routing 1+z
        "rsqrt": 2,      # perc, routing outflow
        "tanh": 2,
        "shift": (num_uh1 - 1) + (num_uh2 - 1) + 2,  # slots + 2 tail writes
    }
    if mse:
        # chunked: one (8, 128) load per series per 8 steps + 3 static
        # row extracts per step + [diff, diff^2, where-mask, accumulate]
        c["load"] = 3.0 / 8.0
        c["cheap"] += 3 + 4
    else:
        c["load"] = 2    # per-step (1, 128) prec/etp loads (traj kernel)
    return c


def snow_layer_census(hyst, ice):
    """Per-layer per-step vector ops of ``_snow_step_layer`` (the
    current kernel: 1/Thacc packed, chunk-8 loads in the MSE path)."""
    c = {
        # g=G+snow(1) th=CTG*eTG+(1-CTG)*T(3) min(1) melting(2 cmp+and)
        # pot_melt: Kf*T(1) min(1) where(1)  first-predicate wheres(2)
        "cheap": 1 + 3 + 1 + 3 + 3 + 2,
        "div": 0, "sqrt": 0, "rsqrt": 0, "tanh": 0,
        "shift": 2,      # G_ref[l] and eTG_ref[l] store+load round trip
        # chunked MSE path: 3 series x (8,128)-load/8 + 3 static extracts
        "load": 3.0 / 8.0,
    }
    c["cheap"] += 3      # static row extracts (snow, rain, temp)
    if hyst:
        # th_melt(1) balance(1) acc?(1) sca_acc(2: mul by packed 1/Thacc
        # + add) th_max(1) sca_abl(cmp + inner where + div + outer
        # where = 3 cheap + 1 div) sca clip+where(3) swe max/where(2)
        # melt(4) g-melt(1) swe zero(2) first-wheres(2)
        # + sca/swe scratch round trips(2 shift)
        c["cheap"] += 1 + 1 + 1 + 2 + 1 + 3 + 3 + 2 + 4 + 1 + 2 + 2
        c["div"] += 1
        c["shift"] += 2
    else:
        # safe where(2) ratio(div + cmp + where) melt(3) g-melt(1)
        c["cheap"] += 2 + 2 + 3 + 1
        c["div"] += 1
    if ice:
        # ddf*T(1) max(1) cmp+where(2) *frac+acc(2)
        c["cheap"] += 6
    c["cheap"] += 1  # liquid_sum accumulate
    return c


def hbv_census():
    """Vector-op counts per timestep of ``pallas_hbv._hbv_step`` (+ MSE
    accumulate): reciprocal FC/PWP rows, branchless freeze/melt arms,
    the reference's t=0 predicates, chunk-8 time loop.

    ``pow``: the soil-moisture exponent ``(soil * iFC) ** Beta`` has a
    *traced* exponent, which Mosaic lowers as an exp/log chain --
    measured as its own class.
    """
    return {
        # freeze cmp(1) melt_pot(2) snow(4) liquid(3) prec_eff muls(2)
        # pe(4) ea(4) soil(3) overflow(3) s1(6) s2(4) q(4) t=0 arm(5)
        "cheap": 1 + 2 + 4 + 3 + 2 + 4 + 4 + 3 + 3 + 6 + 4 + 4 + 5
        # + 5 static row extracts + MSE diff/square/mask/accumulate
        + 5 + 4,
        "pow": 1,
        "div": 0, "sqrt": 0, "rsqrt": 0, "tanh": 0,
        "shift": 4,          # snow/soil/s1/s2 scratch round trips
        "load": 5.0 / 8.0,   # temp/prec/pe/tm/qobs (8,128) loads per 8
    }


def snowgr4j_census(num_layers, num_uh1, num_uh2, hyst, ice):
    serial, parallel = snowgr4j_split_census(num_layers, num_uh1,
                                             num_uh2, hyst, ice)
    total = dict(serial)
    for k, v in parallel.items():
        total[k] = total.get(k, 0) + v
    return total


def snowgr4j_split_census(num_layers, num_uh1, num_uh2, hyst, ice):
    """(serial, parallel) op censuses of the composition kernel.

    The composition has two scheduling regimes the roofline must model
    separately (round 4's single-band model over-predicted its cost
    2.2x -- uninformative as a bound):

    * **serial**: the GR4J step + accumulators -- one dependence chain
      per member tile, costed at the 4-chain ("some ILP") rates that
      round 4 validated to 0.99 on the pure GR4J kernel;
    * **parallel**: the per-layer snow ops -- ``num_layers`` mutually
      independent chains, further overlapped across the 8 unrolled
      chunk steps, which the scheduler can issue at the per-op
      THROUGHPUT plateau (measured with deep independent chains).
    """
    serial = gr4j_census(num_uh1, num_uh2, mse=True)
    serial["cheap"] += 1 + (1 if ice else 0)  # + icemelt add
    serial["div"] += 1                        # layer-mean division
    # The composition loads only etp+qobs as flat series (gr4j_census
    # counted prec/etp/qobs = 3); snow/rain/temp ride per layer.
    serial["load"] -= 1.0 / 8.0
    serial["cheap"] -= 1   # one fewer static row extract likewise
    layer = snow_layer_census(hyst, ice)
    parallel = {k: num_layers * v for k, v in layer.items()}
    return serial, parallel


# ---------------------------------------------------------------------------
# Microbenchmark kernels
# ---------------------------------------------------------------------------

def _op_body(op, a, i):
    if op == "cheap":
        return a * 0.9999994 + 1e-7
    if op == "div":
        return 1.0 / (a + 1.5)
    if op == "sqrt":
        return jnp.sqrt(a + 1.0)
    if op == "rsqrt":
        return lax.rsqrt(a + 1.0)
    if op == "tanh":
        return jnp.tanh(a + 0.1)
    if op == "pow":
        # Traced exponent -> Mosaic's exp/log chain (the HBV soil arm).
        return (a + 1.2) ** (1.3 + a * 1e-9)
    raise ValueError(op)


def _syn_kernel(t_tile, reps, chains, op, seed_ref, out_ref, acc_ref):
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        for k in range(chains):
            acc_ref[k] = seed_ref[...] + 0.01 * k

    def body(i, _):
        vals = [acc_ref[k] for k in range(chains)]
        for _ in range(reps):
            vals = [_op_body(op, v, i) for v in vals]
        for k in range(chains):
            acc_ref[k] = vals[k]
        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)

    @pl.when(tt == pl.num_programs(1) - 1)
    def _():
        tot = acc_ref[0]
        for k in range(1, chains):
            tot = tot + acc_ref[k]
        out_ref[...] = tot


def _shift_kernel(t_tile, slots, seed_ref, out_ref, reg_ref, oh_ref):
    """The UH shift-register pattern: per step, ``slots`` slot updates."""
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        for j in range(slots + 1):
            reg_ref[j] = seed_ref[...] + 0.01 * j
            oh_ref[j] = seed_ref[...] * 0.001 + 0.01

    def body(i, _):
        x = reg_ref[0]
        for j in range(slots):
            reg_ref[j] = reg_ref[j + 1] + oh_ref[j] * x
        reg_ref[slots] = oh_ref[slots] * x
        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)

    @pl.when(tt == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = reg_ref[0]


def _load_kernel(t_tile, reps, rows_ref, seed_ref, out_ref, acc_ref):
    """Per-step lane-replicated (1, 128) row loads broadcast to the tile."""
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        acc_ref[...] = seed_ref[...]

    def body(i, _):
        a = acc_ref[...]
        for r in range(reps):
            a = a + rows_ref[pl.ds((i + r) % t_tile, 1), :]
        acc_ref[...] = a * 1e-6
        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)

    @pl.when(tt == pl.num_programs(1) - 1)
    def _():
        out_ref[...] = acc_ref[...]


def _time_pallas(build, n_launch=3):
    """Best-of-n wall time of ``fn(seed)`` with varying seed (cache-bust).

    Completion is forced with ``float(...)`` (host transfer of a scalar
    reduction): through the remote-TPU tunnel of this environment,
    ``block_until_ready`` returns before the program has actually
    executed -- timings taken with it are fiction (measured: a 67M-op
    kernel "finishing" in 0.36 ms).
    """
    fn = build()
    float(jnp.sum(fn(jnp.float32(0.5))))  # compile + first launch
    best = float("inf")
    for k in range(1, n_launch + 1):
        t0 = time.perf_counter()
        float(jnp.sum(fn(jnp.float32(0.5 + 0.01 * k))))
        best = min(best, time.perf_counter() - t0)
    return best


def measure_class(op, t_tile=128, n_tt=16384, reps_pair=(8, 64), chains=1):
    """Per-op seconds (per (8,128) tile issue) as a slope between two
    reps values -- fixed loop overhead and dispatch cancel exactly."""
    times = []
    for reps in reps_pair:
        def build(reps=reps):
            kern = functools.partial(_syn_kernel, t_tile, reps, chains, op)
            call = pl.pallas_call(
                kern,
                grid=(1, n_tt),
                in_specs=[pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
                scratch_shapes=[pltpu.VMEM((chains,) + TILE, jnp.float32)],
            )

            @jax.jit
            def fn(seed):
                return call(jnp.full(TILE, seed, jnp.float32))

            return fn

        times.append(_time_pallas(build))
    steps = n_tt * t_tile * chains
    return (times[1] - times[0]) / (steps * (reps_pair[1] - reps_pair[0]))


def measure_shift(t_tile=128, n_tt=16384, slots_pair=(4, 20)):
    times = []
    for slots in slots_pair:
        def build(slots=slots):
            kern = functools.partial(_shift_kernel, t_tile, slots)
            call = pl.pallas_call(
                kern,
                grid=(1, n_tt),
                in_specs=[pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((slots_pair[1] + 1,) + TILE, jnp.float32),
                    pltpu.VMEM((slots_pair[1] + 1,) + TILE, jnp.float32),
                ],
            )

            @jax.jit
            def fn(seed):
                return call(jnp.full(TILE, seed, jnp.float32))

            return fn

        times.append(_time_pallas(build))
    steps = n_tt * t_tile
    return (times[1] - times[0]) / (steps * (slots_pair[1] - slots_pair[0]))


def measure_load(t_tile=128, n_tt=16384, reps_pair=(2, 8)):
    times = []
    for reps in reps_pair:
        def build(reps=reps):
            kern = functools.partial(_load_kernel, t_tile, reps)
            call = pl.pallas_call(
                kern,
                grid=(1, n_tt),
                in_specs=[
                    pl.BlockSpec((t_tile, 128), lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
                scratch_shapes=[pltpu.VMEM(TILE, jnp.float32)],
            )

            @jax.jit
            def fn(seed):
                rows = jnp.full((t_tile, 128), seed * 1e-3, jnp.float32)
                return call(rows, jnp.full(TILE, seed, jnp.float32))

            return fn

        times.append(_time_pallas(build))
    steps = n_tt * t_tile
    return (times[1] - times[0]) / (steps * (reps_pair[1] - reps_pair[0]))


def measure_loop_overhead(t_tile=128, ntt_pair=(16384, 65536)):
    """Per-fori-loop-iteration cost at reps=0 (no body ops), as a slope
    between two grid sizes so fixed dispatch cancels."""
    times = []
    for n_tt in ntt_pair:
        def build(n_tt=n_tt):
            kern = functools.partial(_syn_kernel, t_tile, 0, 1, "cheap")
            call = pl.pallas_call(
                kern,
                grid=(1, n_tt),
                in_specs=[pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(TILE, lambda b, t: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(TILE, jnp.float32),
                scratch_shapes=[pltpu.VMEM((1,) + TILE, jnp.float32)],
            )

            @jax.jit
            def fn(seed):
                return call(jnp.full(TILE, seed, jnp.float32))

            return fn

        times.append(_time_pallas(build))
    return (times[1] - times[0]) / ((ntt_pair[1] - ntt_pair[0]) * t_tile)


# ---------------------------------------------------------------------------
# Production-kernel measurements (same configs as bench.py)
# ---------------------------------------------------------------------------

def measure_gr4j_mse(num_params=131072, T=3651, num_uh1=3, num_uh2=7,
                     repeats=8, **kw):
    from rrmpg_tpu.ops.pallas_gr4j import gr4j_ensemble_mse_pallas

    rng = np.random.default_rng(1)
    prec = jnp.asarray(rng.uniform(0, 15, T), jnp.float32)
    etp = jnp.asarray(rng.uniform(0, 4, T), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, T), jnp.float32)
    params = {
        "x1": jnp.asarray(rng.uniform(100, 1200, num_params), jnp.float32),
        "x2": jnp.asarray(rng.uniform(-5, 3, num_params), jnp.float32),
        "x3": jnp.asarray(rng.uniform(20, 300, num_params), jnp.float32),
        "x4": jnp.asarray(rng.uniform(1.1, 2.9, num_params), jnp.float32),
    }

    @jax.jit
    def many(params, seed):
        def body(i, acc):
            p2 = dict(params, x2=params["x2"] + acc * 1e-12 + i * 1e-7
                      + seed * 1e-9)
            losses = gr4j_ensemble_mse_pallas(prec, etp, qobs, 0.3, 0.3,
                                              p2, num_uh1=num_uh1,
                                              num_uh2=num_uh2, **kw)
            return acc + losses[0]
        return lax.fori_loop(0, repeats, body, jnp.float32(0))

    float(many(params, jnp.float32(0)))
    best = float("inf")
    for k in range(1, 3):
        t0 = time.perf_counter()
        float(many(params, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    return best / repeats


def measure_hbv_mse(num_params=131072, T=3651, repeats=8):
    from rrmpg_tpu.ops.pallas_hbv import hbv_ensemble_mse_pallas

    rng = np.random.default_rng(3)
    temp = jnp.asarray(rng.uniform(-10, 20, T), jnp.float32)
    prec = jnp.asarray(rng.uniform(0, 15, T), jnp.float32)
    month = jnp.asarray(rng.integers(0, 12, T))
    pe_m = jnp.asarray(rng.uniform(1, 4, 12), jnp.float32)
    t_m = jnp.asarray(rng.uniform(-5, 15, 12), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, T), jnp.float32)
    params = {
        "T_t": jnp.asarray(rng.uniform(-1, 1, num_params), jnp.float32),
        "DD": jnp.asarray(rng.uniform(3, 7, num_params), jnp.float32),
        "FC": jnp.asarray(rng.uniform(100, 200, num_params), jnp.float32),
        "Beta": jnp.asarray(rng.uniform(1, 7, num_params), jnp.float32),
        "C": jnp.asarray(rng.uniform(0.01, 0.07, num_params), jnp.float32),
        "PWP": jnp.asarray(rng.uniform(90, 180, num_params), jnp.float32),
        "K_0": jnp.asarray(rng.uniform(0.05, 0.2, num_params), jnp.float32),
        "K_1": jnp.asarray(rng.uniform(0.01, 0.1, num_params), jnp.float32),
        "K_2": jnp.asarray(rng.uniform(0.01, 0.05, num_params),
                           jnp.float32),
        "K_p": jnp.asarray(rng.uniform(0.01, 0.05, num_params),
                           jnp.float32),
        "L": jnp.asarray(rng.uniform(2, 5, num_params), jnp.float32),
    }

    @jax.jit
    def many(params, seed):
        def body(i, acc):
            p2 = dict(params, C=params["C"] + acc * 1e-12 + i * 1e-9
                      + seed * 1e-10)
            losses = hbv_ensemble_mse_pallas(
                temp, prec, month, pe_m, t_m, qobs, 0.0, 100.0, 3.0,
                10.0, p2)
            return acc + losses[0]
        return lax.fori_loop(0, repeats, body, jnp.float32(0))

    float(many(params, jnp.float32(0)))
    best = float("inf")
    for k in range(1, 3):
        t0 = time.perf_counter()
        float(many(params, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    return best / repeats


def measure_snow_mse(num_params=131072, T=3651, layers=5, repeats=4):
    from rrmpg_tpu.ops.pallas_snow import snowgr4j_ensemble_mse_pallas

    rng = np.random.default_rng(2)
    prec = jnp.asarray(rng.uniform(0, 15, (T, layers)), jnp.float32)
    mean_temp = jnp.asarray(rng.uniform(-10, 15, (T, layers)), jnp.float32)
    frac_solid = jnp.asarray(rng.uniform(0, 1, (T, layers)), jnp.float32)
    etp = jnp.asarray(rng.uniform(0, 4, T), jnp.float32)
    qobs = jnp.asarray(rng.uniform(0, 5, T), jnp.float32)
    params = {
        "CTG": jnp.asarray(rng.uniform(0, 1, num_params), jnp.float32),
        "Kf": jnp.asarray(rng.uniform(0, 6, num_params), jnp.float32),
        "Thacc": jnp.asarray(rng.uniform(5, 50, num_params), jnp.float32),
        "Rsp": jnp.asarray(rng.uniform(0.1, 1, num_params), jnp.float32),
        "x1": jnp.asarray(rng.uniform(100, 1200, num_params), jnp.float32),
        "x2": jnp.asarray(rng.uniform(-5, 3, num_params), jnp.float32),
        "x3": jnp.asarray(rng.uniform(20, 300, num_params), jnp.float32),
        "x4": jnp.asarray(rng.uniform(1.1, 2.9, num_params), jnp.float32),
        "DDF": jnp.asarray(rng.uniform(1, 10, num_params), jnp.float32),
    }
    frac_ice = jnp.asarray(rng.uniform(0, 0.5, layers), jnp.float32)

    @jax.jit
    def many(params, seed):
        def body(i, acc):
            p2 = dict(params, x2=params["x2"] + acc * 1e-12 + i * 1e-7
                      + seed * 1e-9)
            losses = snowgr4j_ensemble_mse_pallas(
                prec, mean_temp, etp, frac_solid, qobs, 0.0, 0.0, 0.3,
                0.3, p2, frac_ice=frac_ice, hyst=True, ice=True,
                num_uh1=3, num_uh2=7)
            return acc + losses[0]
        return lax.fori_loop(0, repeats, body, jnp.float32(0))

    float(many(params, jnp.float32(0)))
    best = float("inf")
    for k in range(1, 3):
        t0 = time.perf_counter()
        float(many(params, jnp.float32(k)))
        best = min(best, time.perf_counter() - t0)
    return best / repeats


def ideal_time(census, costs, tile_steps, loop_overhead, chunked=True):
    """``chunked``: the production MSE kernels run 8 steps per fori_loop
    iteration, so the measured per-iteration overhead amortizes 8x.
    The fractional census ``load`` entries approximate an (8, 128)
    dynamic load with the measured (1, 128)-row cost (same DMA setup;
    slightly optimistic on bytes, pessimistic on issue count)."""
    per_step = sum(census[k] * costs[k] for k in census)
    return tile_steps * (per_step + loop_overhead / (8 if chunked else 1))


def main():
    dev = jax.devices()[0]
    print(f"[roofline] device: {dev.platform} {dev.device_kind}",
          file=sys.stderr)

    costs_dep, costs_ilp, costs_tput = {}, {}, {}
    pairs = {"cheap": (8, 64), "div": (4, 16), "sqrt": (4, 16),
             "rsqrt": (4, 16), "tanh": (4, 16), "pow": (4, 16)}
    for op in ("cheap", "div", "sqrt", "rsqrt", "tanh", "pow"):
        costs_dep[op] = measure_class(op, reps_pair=pairs[op], chains=1)
        costs_ilp[op] = measure_class(op, reps_pair=pairs[op], chains=4)
        # Throughput plateau: deep independent chains (the scheduler's
        # best case for the mutually independent per-layer snow ops).
        c8 = measure_class(op, reps_pair=pairs[op], chains=8)
        c16 = measure_class(op, reps_pair=pairs[op], chains=16)
        costs_tput[op] = min(c8, c16)
        print(f"[roofline] {op:6s}: dependent {costs_dep[op]*1e9:7.3f} "
              f"ns/tile-op   4-chain {costs_ilp[op]*1e9:7.3f}   "
              f"throughput {costs_tput[op]*1e9:7.3f}",
              file=sys.stderr)
    for costs in (costs_dep, costs_ilp, costs_tput):
        costs["shift"] = measure_shift()
        costs["load"] = measure_load()
    loop_ov = measure_loop_overhead()
    print(f"[roofline] shift : {costs_dep['shift']*1e9:7.3f} ns/slot   "
          f"load: {costs_dep['load']*1e9:7.3f} ns/row   "
          f"loop overhead: {loop_ov*1e9:7.3f} ns/step", file=sys.stderr)

    out = {"device": dev.device_kind,
           "costs_dependent_ns": {k: v * 1e9 for k, v in costs_dep.items()},
           "costs_4chain_ns": {k: v * 1e9 for k, v in costs_ilp.items()},
           "costs_throughput_ns": {k: v * 1e9
                                   for k, v in costs_tput.items()},
           "loop_overhead_ns": loop_ov * 1e9}

    # Band semantics: the census counts every vector op as one VPU issue
    # and the microbench costs are measured in a synthetic context, so
    # ideal_time(costs_4chain) is a MODELED issue floor (optimistic on
    # scheduling, pessimistic on issue count -- it cannot see FMA
    # pairing, sub-tile (1, 128) row ops, or ILP deeper than 4 chains),
    # and ideal_time(costs_dependent) is the no-ILP wall.  A kernel
    # close to (or below) the modeled floor has no headroom reachable by
    # better scheduling alone; further gains require removing ops.
    def report(name, census, t_meas):
        t_lo = ideal_time(census, costs_ilp, tile_steps, loop_ov)
        t_hi = ideal_time(census, costs_dep, tile_steps, loop_ov)
        floor_ratio = t_lo / t_meas
        verdict = ("AT/BEYOND the modeled issue floor (census is "
                   "conservative: FMA pairing / sub-tile ops)"
                   if floor_ratio >= 0.9 else
                   f"{floor_ratio:.0%} of the modeled issue floor")
        print(f"[roofline] {name}: measured {t_meas*1e3:.1f} ms "
              f"({t_meas/tile_steps*1e9:.0f} ns/tile-step); modeled "
              f"band [{t_lo*1e3:.1f}, {t_hi*1e3:.1f}] ms "
              f"(4-chain issue floor .. no-ILP wall); {verdict}",
              file=sys.stderr)
        return {"measured_ms": t_meas * 1e3,
                "ns_per_tile_step": t_meas / tile_steps * 1e9,
                "modeled_floor_ms": t_lo * 1e3,
                "modeled_noilp_ms": t_hi * 1e3,
                "floor_over_measured": floor_ratio,
                "census": census, "tile_steps": tile_steps}

    # --- GR4J MC objective, bench.py config ---
    n_blocks = 131072 // 1024
    tile_steps = n_blocks * (-(-3651 // 128) * 128)
    out["gr4j_mse"] = report("GR4J MSE 131072x3651 (uh 3/7)",
                             gr4j_census(3, 7), measure_gr4j_mse())

    # --- HBV-Edu MC objective, bench.py config (serial chain like GR4J,
    # so the 4-chain band is the validated model form) ---
    out["hbv_mse"] = report("HBV-Edu MSE 131072x3651", hbv_census(),
                            measure_hbv_mse())

    # --- snow hyst+ice MC objective, bench.py config ---
    # Split model (see snowgr4j_split_census): the serial GR4J section
    # at the 4-chain rates validated on the pure GR4J kernel, the
    # mutually independent per-layer snow section at the measured
    # throughput plateau.  Round 4's single-band model (everything at
    # 4-chain) over-predicted this kernel 2.2x and bounded nothing.
    serial, parallel = snowgr4j_split_census(5, 3, 7, hyst=True,
                                             ice=True)
    t_snow = measure_snow_mse()
    t_serial = sum(serial[k] * costs_ilp[k] for k in serial)
    t_parallel = sum(parallel[k] * costs_tput[k] for k in parallel)
    t_lo = tile_steps * (t_serial + t_parallel + loop_ov / 8)
    census_all = snowgr4j_census(5, 3, 7, hyst=True, ice=True)
    t_hi = ideal_time(census_all, costs_dep, tile_steps, loop_ov)
    floor_ratio = t_lo / t_snow
    print(f"[roofline] Snow(hyst+ice,5L)+GR4J MSE 131072x3651: measured "
          f"{t_snow*1e3:.1f} ms ({t_snow/tile_steps*1e9:.0f} "
          f"ns/tile-step); split-model band [{t_lo*1e3:.1f}, "
          f"{t_hi*1e3:.1f}] ms (serial@4-chain + layers@throughput .. "
          f"no-ILP wall); floor/measured = {floor_ratio:.2f}",
          file=sys.stderr)

    # Where the residual model error lives: the measured marginal cost
    # of one snow layer vs the one-issue-per-censused-op plateau.  The
    # plateau itself is saturated (chains 16/32/64 agree within noise),
    # so an effective per-censused-op cost BELOW it is issue fusion in
    # the compiled kernel (FMA pairing, cmp+select folding) that a
    # source-level census cannot see -- evidence the kernel is
    # issue-throughput-bound with no scheduling headroom, not evidence
    # of slack.
    t_snow1 = measure_snow_mse(layers=1)
    layer_c = snow_layer_census(hyst=True, ice=True)
    per_layer_meas = (t_snow - t_snow1) / 4 / tile_steps
    per_layer_model = sum(layer_c[k] * costs_tput[k] for k in layer_c)
    n_censused = sum(layer_c.values())
    eff_ns = per_layer_meas / n_censused * 1e9
    print(f"[roofline] snow layer marginal: measured "
          f"{per_layer_meas*1e9:.1f} ns/layer-step vs "
          f"{per_layer_model*1e9:.1f} modeled at the saturated plateau "
          f"({n_censused:.1f} censused ops -> {eff_ns:.2f} ns/op "
          f"effective vs {costs_tput['cheap']*1e9:.2f} measured "
          f"single-issue floor => ~{per_layer_model/per_layer_meas:.1f}x "
          f"issue fusion)", file=sys.stderr)

    out["snow_mse"] = {
        "measured_ms": t_snow * 1e3,
        "ns_per_tile_step": t_snow / tile_steps * 1e9,
        "modeled_floor_ms": t_lo * 1e3,
        "modeled_noilp_ms": t_hi * 1e3,
        "floor_over_measured": floor_ratio,
        "model": "split: serial(GR4J)@4chain + layers@throughput",
        "census_serial": serial, "census_parallel": parallel,
        "tile_steps": tile_steps,
        "layer_marginal": {
            "measured_ns_per_layer_step": per_layer_meas * 1e9,
            "modeled_ns_at_plateau": per_layer_model * 1e9,
            "censused_ops_per_layer_step": n_censused,
            "effective_ns_per_censused_op": eff_ns,
            "issue_fusion_x": per_layer_model / per_layer_meas,
        },
    }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
