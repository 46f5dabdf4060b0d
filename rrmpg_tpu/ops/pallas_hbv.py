"""Fused Pallas HBV-Edu ensemble objective kernel.

Same architecture as :mod:`rrmpg_tpu.ops.pallas_gr4j`: the full HBV time
loop for an (8, 128)-member tile runs inside one Pallas program with the
four storages (snow, soil, near-surface, base-flow) in VMEM scratch, the
month-gathered climatologies lane-replicated per timestep, and the squared
error accumulated on-chip -- one float per member reaches HBM.

Step math follows the reference loop exactly
(``rrmpg/models/hbvedu_model.py:86-127``), including its unclamped soil
store (a negative soil level yields NaN through the Beta power, exactly as
the reference's ``np.power`` does -- the DE optimizer rejects such
candidates).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_gr4j import (
    BLOCK,
    BLOCK_LANES,
    BLOCK_SUBLANES,
    _pack_series,
)

# Parameter-row layout.  Rows 15/16 carry pack-time reciprocals of the
# two constant-per-member denominators (FC, PWP) so the step's divisions
# become multiplies (same economy as pallas_gr4j's 1/x1, 1/x3 rows).
_ROWS = ('T_t', 'DD', 'FC', 'Beta', 'C', 'PWP', 'K_0', 'K_1', 'K_2',
         'K_p', 'L')
_R_SNOW0, _R_SOIL0, _R_S10, _R_S20 = 11, 12, 13, 14
_R_IFC, _R_IPWP = 15, 16
_NUM_ROWS = 17


def _init_stores(params_ref, snow_ref, soil_ref, s1_ref, s2_ref):
    snow_ref[...] = params_ref[_R_SNOW0, 0]
    soil_ref[...] = params_ref[_R_SOIL0, 0]
    s1_ref[...] = params_ref[_R_S10, 0]
    s2_ref[...] = params_ref[_R_S20, 0]


def _hbv_step(t, temp_t, prec_t, pe_month, t_month, params_ref,
              snow_ref, soil_ref, s1_ref, s2_ref, warm=False):
    """One HBV timestep over an (8, 128) member tile; returns (1, 128) q.

    Forcing rows arrive pre-loaded (the callers load (8, 128) chunks and
    pass static row extracts, same chunk-8 structure as pallas_gr4j).

    ``warm`` (compile-time) drops the reference's t=0 init step (stores
    frozen, q=0, ``hbvedu_model.py:84-86``): a warm continuation
    advances the carried storages at every timestep, exactly like
    :func:`rrmpg_tpu.ops.hbvedu.run_hbvedu_warm`.
    """
    T_t = params_ref[0, 0]
    DD = params_ref[1, 0]
    Beta = params_ref[3, 0]
    C = params_ref[4, 0]
    PWP = params_ref[5, 0]
    K_0 = params_ref[6, 0]
    K_1 = params_ref[7, 0]
    K_2 = params_ref[8, 0]
    K_p = params_ref[9, 0]
    L = params_ref[10, 0]
    iFC = params_ref[_R_IFC, 0]
    iPWP = params_ref[_R_IPWP, 0]

    snow_prev = snow_ref[...]
    soil_prev = soil_ref[...]
    s1_prev = s1_ref[...]
    s2_prev = s2_ref[...]

    freezing = temp_t < T_t
    melt_pot = DD * (temp_t - T_t)
    snow = jnp.where(freezing, snow_prev + prec_t,
                     jnp.maximum(0.0, snow_prev - melt_pot))
    liquid = jnp.where(freezing, 0.0,
                       prec_t + jnp.minimum(snow_prev, melt_pot))

    prec_eff = liquid * (soil_prev * iFC) ** Beta
    pe = (1.0 + C * (temp_t - t_month)) * pe_month
    ea = jnp.where(soil_prev > PWP, pe, pe * (soil_prev * iPWP))
    soil = soil_prev + liquid - prec_eff - ea

    overflow = jnp.maximum(0.0, s1_prev - L) * K_0
    s1 = s1_prev + prec_eff - overflow - s1_prev * K_1 - s1_prev * K_p
    s2 = s2_prev + s1_prev * K_p - s2_prev * K_2
    q = overflow + s1 * K_1 + s2 * K_2

    if warm:
        snow_ref[...] = snow
        soil_ref[...] = soil
        s1_ref[...] = s1
        s2_ref[...] = s2
        return q
    first = t == 0
    snow_ref[...] = jnp.where(first, snow_prev, snow)
    soil_ref[...] = jnp.where(first, soil_prev, soil)
    s1_ref[...] = jnp.where(first, s1_prev, s1)
    s2_ref[...] = jnp.where(first, s2_prev, s2)
    return jnp.where(first, 0.0, q)


def _kernel(t_tile, t_real, temp_ref, prec_ref, pe_ref, tm_ref, qobs_ref,
            params_ref, out_ref, snow_ref, soil_ref, s1_ref, s2_ref,
            sse_ref, masked=False, warm=False):
    tt = pl.program_id(1)
    n_tt = pl.num_programs(1)

    @pl.when(tt == 0)
    def _():
        _init_stores(params_ref, snow_ref, soil_ref, s1_ref, s2_ref)
        sse_ref[...] = jnp.zeros_like(sse_ref)

    # Chunk-8 time loop (see pallas_gr4j._mse_kernel): one (8, 128)
    # load per series per 8 steps, accumulator in registers, 8-step
    # unrolled body for the Mosaic scheduling window.
    def body(i8, _):
        base = i8 * 8
        t8 = temp_ref[pl.ds(base, 8), :]
        p8 = prec_ref[pl.ds(base, 8), :]
        pe8 = pe_ref[pl.ds(base, 8), :]
        tm8 = tm_ref[pl.ds(base, 8), :]
        q8 = qobs_ref[pl.ds(base, 8), :]
        sse = sse_ref[...]
        for k in range(8):
            t = tt * t_tile + base + k
            q = _hbv_step(t, t8[k:k + 1, :], p8[k:k + 1, :],
                          pe8[k:k + 1, :], tm8[k:k + 1, :], params_ref,
                          snow_ref, soil_ref, s1_ref, s2_ref, warm=warm)
            qo = q8[k:k + 1, :]
            diff = q - qo
            # Tail padding mask (and NaN observation gaps when masked).
            valid = (t < t_real) & (qo == qo) if masked else t < t_real
            sse += jnp.where(valid, diff * diff, 0.0)
        sse_ref[...] = sse
        return ()

    lax.fori_loop(0, t_tile // 8, body, (), unroll=False)

    @pl.when(tt == n_tt - 1)
    def _():
        out_ref[0] = sse_ref[...] / t_real


def _stats_kernel(t_tile, t_real, temp_ref, prec_ref, pe_ref, tm_ref,
                  qobs_ref, params_ref, out_ref, snow_ref, soil_ref,
                  s1_ref, s2_ref, acc_ref, masked=False, warm=False):
    """Like ``_kernel`` but accumulates the four time-mean sufficient
    statistics [mse, mean_q, mean_q^2, mean_q*qobs] per member (see
    ``rrmpg_tpu.ops.pallas_snow.losses_from_stats``)."""
    tt = pl.program_id(1)
    n_tt = pl.num_programs(1)

    @pl.when(tt == 0)
    def _():
        _init_stores(params_ref, snow_ref, soil_ref, s1_ref, s2_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def body(i8, _):
        base = i8 * 8
        t8 = temp_ref[pl.ds(base, 8), :]
        p8 = prec_ref[pl.ds(base, 8), :]
        pe8 = pe_ref[pl.ds(base, 8), :]
        tm8 = tm_ref[pl.ds(base, 8), :]
        q8 = qobs_ref[pl.ds(base, 8), :]
        accs = [acc_ref[k] for k in range(4)]
        for k in range(8):
            t = tt * t_tile + base + k
            q = _hbv_step(t, t8[k:k + 1, :], p8[k:k + 1, :],
                          pe8[k:k + 1, :], tm8[k:k + 1, :], params_ref,
                          snow_ref, soil_ref, s1_ref, s2_ref, warm=warm)
            qo = q8[k:k + 1, :]
            # Tail padding mask (and NaN observation gaps when masked;
            # gap rows are zeroed before the products stay finite).
            if masked:
                finite = qo == qo
                w = jnp.where((t < t_real) & finite, 1.0, 0.0)
                qo = jnp.where(finite, qo, 0.0)
            else:
                w = jnp.where(t < t_real, 1.0, 0.0)
            diff = q - qo
            accs[0] += w * diff * diff
            accs[1] += w * q
            accs[2] += w * q * q
            accs[3] += w * q * qo
        for k in range(4):
            acc_ref[k] = accs[k]
        return ()

    lax.fori_loop(0, t_tile // 8, body, (), unroll=False)

    @pl.when(tt == n_tt - 1)
    def _():
        out_ref[0] = acc_ref[...] / t_real


def _traj_kernel(t_tile, temp_ref, prec_ref, pe_ref, tm_ref, params_ref,
                 out_ref, snow_ref, soil_ref, s1_ref, s2_ref):
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        _init_stores(params_ref, snow_ref, soil_ref, s1_ref, s2_ref)

    def body(i, _):
        t = tt * t_tile + i
        q = _hbv_step(t, temp_ref[pl.ds(i, 1), :],
                      prec_ref[pl.ds(i, 1), :], pe_ref[pl.ds(i, 1), :],
                      tm_ref[pl.ds(i, 1), :], params_ref, snow_ref,
                      soil_ref, s1_ref, s2_ref)
        out_ref[0, i] = q
        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)


def _traj_state_kernel(t_tile, t_real, warm, temp_ref, prec_ref, pe_ref,
                       tm_ref, params_ref, out_ref, fstate_ref, snow_ref,
                       soil_ref, s1_ref, s2_ref):
    """Trajectory + end-of-series state exit (forecast mode).

    The final storages are captured at exactly ``t == t_real - 1`` --
    the padded tail steps beyond the true series length keep mutating
    the scratch stores on zero forcing and must not leak into the
    state bundle.
    """
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        _init_stores(params_ref, snow_ref, soil_ref, s1_ref, s2_ref)

    def body(i, _):
        t = tt * t_tile + i
        q = _hbv_step(t, temp_ref[pl.ds(i, 1), :],
                      prec_ref[pl.ds(i, 1), :], pe_ref[pl.ds(i, 1), :],
                      tm_ref[pl.ds(i, 1), :], params_ref, snow_ref,
                      soil_ref, s1_ref, s2_ref, warm=warm)
        out_ref[0, i] = q

        @pl.when(t == t_real - 1)
        def _():
            fstate_ref[0, 0] = snow_ref[...]
            fstate_ref[0, 1] = soil_ref[...]
            fstate_ref[0, 2] = s1_ref[...]
            fstate_ref[0, 3] = s2_ref[...]

        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)


def _prepare(temp, prec, month, pe_m, t_m, snow_init, soil_init, s1_init,
             s2_init, params, t_tile):
    """Pack params into (15, nB, 8, 128) and series into (T_pad, 128)."""
    dtype = jnp.asarray(prec).dtype
    month = jnp.asarray(month)
    pe_series = jnp.asarray(pe_m, dtype)[month]
    tm_series = jnp.asarray(t_m, dtype)[month]

    n = jnp.asarray(params['T_t']).shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    rows = [jnp.asarray(params[k], dtype) for k in _ROWS]
    ones_n = jnp.ones(n, dtype)
    rows += [jnp.asarray(v, dtype) * ones_n
             for v in (snow_init, soil_init, s1_init, s2_init)]
    rows += [1.0 / jnp.asarray(params['FC'], dtype),
             1.0 / jnp.asarray(params['PWP'], dtype)]
    packed = jnp.pad(jnp.stack(rows), ((0, 0), (0, n_pad - n)),
                     constant_values=1.0)
    packed = packed.reshape(_NUM_ROWS, n_pad // BLOCK, BLOCK_SUBLANES,
                            BLOCK_LANES)

    temp_b, t_pad = _pack_series(temp, t_tile, dtype)
    prec_b, _ = _pack_series(prec, t_tile, dtype)
    pe_b, _ = _pack_series(pe_series, t_tile, dtype)
    tm_b, _ = _pack_series(tm_series, t_tile, dtype)
    return (packed, temp_b, prec_b, pe_b, tm_b, n, n_pad, t_pad, dtype)


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret",
                                              "stats", "masked", "warm"))
def hbv_ensemble_mse_pallas(temp, prec, month, pe_m, t_m, qobs, snow_init,
                            soil_init, s1_init, s2_init, params,
                            t_tile=128, interpret=False, stats=False,
                            masked=False, state=None, warm=None):
    """Fused HBV-Edu ensemble MSE; returns (N,) losses.

    Args:
        temp, prec: (T,) forcing series.
        month: (T,) 0-based month indices.
        pe_m, t_m: (12,) monthly climatologies (gathered host-side).
        qobs: (T,) observations.
        snow_init, soil_init, s1_init, s2_init: scalar initial storages.
        params: dict of (N,) arrays for the 11 HBV parameters.
        stats: return the (4, N) time-mean sufficient statistics
            [mse, mean_q, mean_q^2, mean_q*qobs] instead (for NSE/KGE
            objectives via ``pallas_snow.losses_from_stats``).
        masked: (compile-time) treat NaN observations as missing-data
            gaps, excluded from the accumulations and the normalization.
        state: (optional) batched
            :class:`~rrmpg_tpu.models.states.HBVEduState` -- the
            objective evaluates a WARM continuation from the carried
            storages (no reference t=0 init step), the fused path for
            ``fit(initial_state=, engine='pallas')``.  ``warm``
            statically overrides ``state is not None``.
    """
    from .pallas_gr4j import _check_t_tile
    _check_t_tile(t_tile)
    if warm is None:
        warm = state is not None
    if warm:
        inits = (state.snow, state.soil, state.s1, state.s2)
    else:
        inits = (snow_init, soil_init, s1_init, s2_init)
    (packed, temp_b, prec_b, pe_b, tm_b, n, n_pad, t_pad,
     dtype) = _prepare(temp, prec, month, pe_m, t_m, *inits, params,
                       t_tile)
    t_real = jnp.asarray(prec).shape[0]
    qobs_b, _ = _pack_series(qobs, t_tile, dtype)

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    series_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                               memory_space=pltpu.VMEM)

    if stats:
        kernel = functools.partial(_stats_kernel, t_tile, t_real,
                                   masked=masked, warm=warm)
        out_specs = pl.BlockSpec((1, 4) + tile,
                                 lambda b, t: (b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks, 4) + tile, dtype)
        scratch = ([pltpu.VMEM(tile, dtype) for _ in range(4)]
                   + [pltpu.VMEM((4,) + tile, dtype)])
    else:
        kernel = functools.partial(_kernel, t_tile, t_real,
                                   masked=masked, warm=warm)
        out_specs = pl.BlockSpec((1,) + tile, lambda b, t: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((n_blocks,) + tile, dtype)
        scratch = [pltpu.VMEM(tile, dtype) for _ in range(5)]

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tt),
        in_specs=[
            series_spec, series_spec, series_spec, series_spec,
            series_spec,
            pl.BlockSpec((_NUM_ROWS, 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(temp_b, prec_b, pe_b, tm_b, qobs_b, packed)

    if masked:
        # The kernel normalized by t_real; renormalize over valid steps.
        scale = t_real / jnp.sum(jnp.isfinite(jnp.asarray(qobs)))
    else:
        scale = 1.0
    if stats:
        return out.transpose(1, 0, 2, 3).reshape(4, n_pad)[:, :n] * scale
    return out.reshape(n_pad)[:n] * scale


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret"))
def hbv_simulate_pallas(temp, prec, month, pe_m, t_m, snow_init,
                        soil_init, s1_init, s2_init, params, t_tile=128,
                        interpret=False):
    """Fused-ensemble HBV-Edu simulation; returns qsim with shape (N, T).

    Trajectory mode of :func:`hbv_ensemble_mse_pallas`: the same fused time
    loop, but the discharge series is written out per timestep instead of
    being reduced to a loss.
    """
    (packed, temp_b, prec_b, pe_b, tm_b, n, n_pad, t_pad,
     dtype) = _prepare(temp, prec, month, pe_m, t_m, snow_init, soil_init,
                       s1_init, s2_init, params, t_tile)

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    series_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                               memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        functools.partial(_traj_kernel, t_tile),
        grid=(n_blocks, n_tt),
        in_specs=[
            series_spec, series_spec, series_spec, series_spec,
            pl.BlockSpec((_NUM_ROWS, 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile) + tile, lambda b, t: (b, t, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, t_pad) + tile, dtype),
        scratch_shapes=[pltpu.VMEM(tile, dtype) for _ in range(4)],
        interpret=interpret,
    )(temp_b, prec_b, pe_b, tm_b, packed)

    qsim = out.transpose(0, 2, 3, 1).reshape(n_pad, t_pad)
    return qsim[:n, :jnp.asarray(prec).shape[0]]


@functools.partial(jax.jit, static_argnames=("t_tile", "interpret",
                                              "warm"))
def hbv_simulate_pallas_state(temp, prec, month, pe_m, t_m, snow_init,
                              soil_init, s1_init, s2_init, params,
                              t_tile=128, interpret=False, state=None,
                              warm=None):
    """Fused HBV-Edu simulation with state entry/exit (forecast mode).

    Like :func:`hbv_simulate_pallas` but additionally returns the
    end-of-series storages, and -- with ``state`` (a batched
    :class:`~rrmpg_tpu.models.states.HBVEduState`, every leaf carrying
    the member axis) -- evaluates a WARM continuation: the storages
    enter the kernel's VMEM at the carried levels and every timestep
    advances them (no reference t=0 init step), matching
    :func:`rrmpg_tpu.ops.hbvedu.run_hbvedu_warm` exactly.  ``warm``
    statically overrides ``state is not None`` for jit re-trace keying.

    Returns:
        ``(qsim (N, T), HBVEduState)`` with the member axis leading.
    """
    from ..models.states import HBVEduState

    if warm is None:
        warm = state is not None
    if warm:
        inits = (state.snow, state.soil, state.s1, state.s2)
    else:
        inits = (snow_init, soil_init, s1_init, s2_init)
    (packed, temp_b, prec_b, pe_b, tm_b, n, n_pad, t_pad,
     dtype) = _prepare(temp, prec, month, pe_m, t_m, *inits, params,
                       t_tile)
    t_real = jnp.asarray(prec).shape[0]

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    series_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                               memory_space=pltpu.VMEM)

    out, fstate = pl.pallas_call(
        functools.partial(_traj_state_kernel, t_tile, t_real, warm),
        grid=(n_blocks, n_tt),
        in_specs=[
            series_spec, series_spec, series_spec, series_spec,
            pl.BlockSpec((_NUM_ROWS, 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile) + tile, lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4) + tile, lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, t_pad) + tile, dtype),
            jax.ShapeDtypeStruct((n_blocks, 4) + tile, dtype),
        ],
        scratch_shapes=[pltpu.VMEM(tile, dtype) for _ in range(4)],
        interpret=interpret,
    )(temp_b, prec_b, pe_b, tm_b, packed)

    qsim = out.transpose(0, 2, 3, 1).reshape(n_pad, t_pad)[:n, :t_real]
    fs = fstate.transpose(1, 0, 2, 3).reshape(4, n_pad)[:, :n]
    final = HBVEduState(snow=fs[0], soil=fs[1], s1=fs[2], s2=fs[3])
    return qsim, final
