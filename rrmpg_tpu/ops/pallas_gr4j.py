"""Fused Pallas GR4J ensemble kernels.

The XLA path (``ops/gr4j.py``) runs two ``lax.scan`` while-loops whose
carries and per-step outputs live in HBM -- at large ensembles the scans
become HBM-bandwidth-bound on state traffic.  These kernels fuse the
*entire* GR4J time loop for a (8, 128)-member tile into one Pallas program:

* carries (production store, routing store, both unit-hydrograph shift
  registers) live in VMEM scratch for the whole simulation;
* the grid is (member_blocks, time_tiles) with the time axis iterated
  sequentially (TPU grid minor dimension) so scratch state persists
  across time tiles;
* UH ordinates are computed once per member block at t=0 from x4
  (statically padded to the bound-derived maxima, ceil(x4) <= 10 /
  ceil(2*x4+1) <= 21, same masking-free padding as ``ops/uh.py``);
* ``gr4j_ensemble_mse_pallas`` additionally folds the objective into the
  kernel: it accumulates the squared error against observations in VMEM
  and writes ONE float per member -- zero trajectory HBM traffic, which is
  the Monte-Carlo / calibration production path.

Step math follows the reference loop (``rrmpg/models/gr4j_model.py:86-154``)
exactly; integer powers are expanded to multiply/sqrt chains for the VPU.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .uh import NUM_UH1, NUM_UH2, s_curve1 as _s_curve1
from .uh import s_curve2 as _s_curve2

BLOCK_SUBLANES = 8
BLOCK_LANES = 128
BLOCK = BLOCK_SUBLANES * BLOCK_LANES  # members per program: one f32 tile


def _check_t_tile(t_tile):
    """The objective kernels chunk their time loop by 8 (one (8, 128)
    dynamic-sublane load per series per 8 steps); a t_tile that is not a
    positive multiple of 8 would silently skip the last ``t_tile % 8``
    steps of EVERY time tile (or, below 8, run zero steps)."""
    if t_tile < 8 or t_tile % 8 != 0:
        raise ValueError(
            f"t_tile must be a positive multiple of 8, got {t_tile}.")


def _pow4(x):
    x2 = x * x
    return x2 * x2


def _gr4j_step(num_uh1, num_uh2, p, e, params_ref, s_ref, r_ref, uh1_ref,
               uh2_ref, oh1_ref, oh2_ref):
    """One GR4J timestep on an (8, 128) member tile; returns discharge.

    Two VPU-issue economies vs the naive rendering (measured together
    at 5% on the full MSE kernel: 62.1 -> 59.1 ms at 131072 x 3651,
    variant decomposition re-measured in round 4 -- see
    docs/performance.md):

    * ``1/x1`` and ``1/x3`` ride in as packed parameter rows (rows 6/7,
      computed once at pack time), turning six per-step divisions into
      multiplies -- on this VPU a divide costs ~5x a multiply and the
      step does 3651 of each per simulated decade.  Only the two
      state-dependent denominators (p_s / e_s) remain true divides.
    * The rain/evaporation branch needs no ``where``: both arms were
      always computed anyway (SIMD), and the inactive arm is EXACTLY
      zero because ``p_n``/``pe_n`` is exactly zero there, making
      ``tanh(0) = 0`` kill the numerator while the denominator stays 1.
    """
    x1 = params_ref[0, 0]
    x2 = params_ref[1, 0]
    ix1 = params_ref[6, 0]
    ix3 = params_ref[7, 0]

    s = s_ref[...]
    r = r_ref[...]

    # --- production store (eq. 3/4 + percolation) ---
    p_n = jnp.maximum(p - e, 0.0)
    pe_n = jnp.maximum(e - p, 0.0)
    sr = s * ix1
    tanh_pn = jnp.tanh(p_n * ix1)
    tanh_pen = jnp.tanh(pe_n * ix1)
    p_s = (x1 * (1.0 - sr * sr) * tanh_pn) / (1.0 + sr * tanh_pn)
    e_s = (s * (2.0 - sr) * tanh_pen) / (1.0 + (1.0 - sr) * tanh_pen)
    s_interim = s - e_s + p_s
    z = _pow4(s_interim * ix1 * (4.0 / 9.0))
    perc = s_interim * (1.0 - lax.rsqrt(jnp.sqrt(1.0 + z)))
    s_new = s_interim - perc
    s_ref[...] = s_new
    p_r = perc + (p_n - p_s)

    # --- unit hydrograph shift registers ---
    pr1 = 0.9 * p_r
    pr2 = 0.1 * p_r
    for j in range(num_uh1 - 1):
        uh1_ref[j] = uh1_ref[j + 1] + oh1_ref[j] * pr1
    uh1_ref[num_uh1 - 1] = oh1_ref[num_uh1 - 1] * pr1
    for j in range(num_uh2 - 1):
        uh2_ref[j] = uh2_ref[j + 1] + oh2_ref[j] * pr2
    uh2_ref[num_uh2 - 1] = oh2_ref[num_uh2 - 1] * pr2

    # --- routing store (eq. 18 + non-linear outflow) ---
    rx = r * ix3
    rx2 = rx * rx
    gw_exchange = x2 * (rx2 * rx * jnp.sqrt(rx))       # (r/x3)^3.5
    r_interim = jnp.maximum(0.0, r + uh1_ref[0] + gw_exchange)
    z = _pow4(r_interim * ix3)
    q_r = r_interim * (1.0 - lax.rsqrt(jnp.sqrt(1.0 + z)))
    r_ref[...] = r_interim - q_r
    q_d = jnp.maximum(0.0, uh2_ref[0] + gw_exchange)
    return q_r + q_d, p_r


def _init_block(num_uh1, num_uh2, params_ref, s_ref, r_ref, uh1_ref,
                uh2_ref, oh1_ref, oh2_ref, hist_ref=None):
    """Per-member-block initialization at the first time tile.

    With ``hist_ref`` (an (H, 8, 128) block of the last ``H = num_uh2-1``
    routing inputs, oldest first), the UH shift registers are rebuilt to
    the exact state an unbroken run would carry: the register invariant is
    ``uh[j] = sum_m oh[j+m] * pr_{t-1-m}`` (each register holds the
    partial FIR sums still owed by past inputs), so warm init is the
    triangular contraction of the history against the tail ordinates --
    bit-matching the XLA warm path's FIR over ``[history | segment]``
    (``ops/gr4j.py:run_gr4j_warm``).
    """
    dtype = s_ref.dtype
    s_ref[...] = params_ref[4, 0]  # absolute initial production store
    r_ref[...] = params_ref[5, 0]  # absolute initial routing store
    x4 = params_ref[3, 0]
    for j in range(num_uh1):
        oh1_ref[j] = (_s_curve1(jnp.asarray(j + 1.0, dtype), x4) -
                      _s_curve1(jnp.asarray(j + 0.0, dtype), x4))
    for j in range(num_uh2):
        oh2_ref[j] = (_s_curve2(jnp.asarray(j + 1.0, dtype), x4) -
                      _s_curve2(jnp.asarray(j + 0.0, dtype), x4))
    h = 0 if hist_ref is None else num_uh2 - 1
    for j in range(num_uh1):
        acc = jnp.zeros_like(x4)
        for m in range(min(h, num_uh1 - j)):
            acc += oh1_ref[j + m] * (0.9 * hist_ref[h - 1 - m, 0])
        uh1_ref[j] = acc
    for j in range(num_uh2):
        acc = jnp.zeros_like(x4)
        for m in range(min(h, num_uh2 - j)):
            acc += oh2_ref[j + m] * (0.1 * hist_ref[h - 1 - m, 0])
        uh2_ref[j] = acc


def _traj_kernel(t_tile, num_uh1, num_uh2, prec_ref, etp_ref, params_ref,
                 out_ref, s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref,
                 oh2_ref):
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        _init_block(num_uh1, num_uh2, params_ref, s_ref, r_ref, uh1_ref,
                    uh2_ref, oh1_ref, oh2_ref)

    def body(i, _):
        # (1, 128) lane-replicated forcing rows broadcast against (8, 128)
        # member tiles (Mosaic cannot scalar-load at dynamic lane offsets).
        p = prec_ref[pl.ds(i, 1), :]
        e = etp_ref[pl.ds(i, 1), :]
        q, _ = _gr4j_step(num_uh1, num_uh2, p, e, params_ref, s_ref,
                          r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref)
        out_ref[0, i] = q
        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)


def _traj_final_kernel(t_tile, t_real, num_uh1, num_uh2, warm, prec_ref,
                       etp_ref, params_ref, hist_ref, out_ref, fstate_ref,
                       s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref,
                       hist_scratch):
    """Forecast-mode trajectory kernel: optional warm entry (UH registers
    rebuilt from the carried routing-input history) and final-state exit.

    The state snapshot is captured inside the time loop at the last REAL
    step (``t == t_real - 1``): steps beyond ``t_real`` (zero-padded to
    the tile grid) still run -- their trajectory output is sliced off
    host-side -- but cannot corrupt the captured state, so no per-step
    predication is paid.
    """
    h = num_uh2 - 1
    tt = pl.program_id(1)

    @pl.when(tt == 0)
    def _():
        _init_block(num_uh1, num_uh2, params_ref, s_ref, r_ref, uh1_ref,
                    uh2_ref, oh1_ref, oh2_ref,
                    hist_ref=hist_ref if warm else None)
        for j in range(h):
            hist_scratch[j] = (hist_ref[j, 0] if warm
                               else jnp.zeros_like(s_ref[...]))

    def body(i, _):
        p = prec_ref[pl.ds(i, 1), :]
        e = etp_ref[pl.ds(i, 1), :]
        q, p_r = _gr4j_step(num_uh1, num_uh2, p, e, params_ref, s_ref,
                            r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref)
        out_ref[0, i] = q
        for j in range(h - 1):
            hist_scratch[j] = hist_scratch[j + 1]
        if h > 0:
            hist_scratch[h - 1] = jnp.broadcast_to(p_r,
                                                   hist_scratch[h - 1].shape)

        @pl.when(tt * t_tile + i == t_real - 1)
        def _():
            fstate_ref[0, 0] = s_ref[...]
            fstate_ref[0, 1] = r_ref[...]
            for j in range(h):
                fstate_ref[0, 2 + j] = hist_scratch[j]

        return ()

    lax.fori_loop(0, t_tile, body, (), unroll=False)


def _mse_kernel(t_tile, t_real, num_uh1, num_uh2, prec_ref, etp_ref,
                qobs_ref, params_ref, out_ref, s_ref, r_ref, uh1_ref,
                uh2_ref, oh1_ref, oh2_ref, sse_ref, t_axis=1,
                hist_ref=None, masked=False):
    """Fused simulate+MSE. With ``hist_ref`` (warm calibration), the UH
    shift registers rebuild from the carried routing-input history and
    the stores enter from the packed absolute s0/r0 rows.

    ``masked`` (compile-time) additionally excludes NaN observations
    (missing-data gaps); the kernel still normalizes by ``t_real`` --
    the wrapper rescales by ``t_real / n_valid`` host-side, so the
    fast gap-free specialization stays untouched."""
    tt = pl.program_id(t_axis)
    n_tt = pl.num_programs(t_axis)

    @pl.when(tt == 0)
    def _():
        _init_block(num_uh1, num_uh2, params_ref, s_ref, r_ref, uh1_ref,
                    uh2_ref, oh1_ref, oh2_ref, hist_ref=hist_ref)
        sse_ref[...] = jnp.zeros_like(sse_ref)

    # Time loop chunked by 8: one (8, 128) dynamic-sublane load per
    # forcing series per 8 steps (static row extracts inside the chunk)
    # and 8x fewer fori_loop iterations.  Measured at 1.65x on the full
    # MSE kernel (59.1 -> 35.7 ms at 131072 x 3651, round-4 variant
    # decomposition) -- far more than the ~17 ns/step of loads + loop
    # overhead it removes: the 8-step unrolled body hands Mosaic a
    # scheduling window with cross-step ILP (independent production /
    # routing chains, UH shifts) that a 1-step body cannot expose.
    def body(i8, _):
        base = i8 * 8
        p8 = prec_ref[pl.ds(base, 8), :]
        e8 = etp_ref[pl.ds(base, 8), :]
        q8 = qobs_ref[pl.ds(base, 8), :]
        sse = sse_ref[...]
        for k in range(8):
            q, _ = _gr4j_step(num_uh1, num_uh2, p8[k:k + 1, :],
                              e8[k:k + 1, :], params_ref, s_ref,
                              r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref)
            qo = q8[k:k + 1, :]
            diff = q - qo
            # Mask the zero-padded tail beyond the true series length
            # (and, in masked mode, NaN observation gaps -- the select
            # discards the NaN product lanes).
            t = tt * t_tile + base + k
            valid = (t < t_real) & (qo == qo) if masked else t < t_real
            sse += jnp.where(valid, diff * diff, 0.0)
        sse_ref[...] = sse
        return ()

    lax.fori_loop(0, t_tile // 8, body, (), unroll=False)

    @pl.when(tt == n_tt - 1)
    def _():
        out_ref[0] = sse_ref[...] / t_real


def _stats_kernel(t_tile, t_real, num_uh1, num_uh2, prec_ref, etp_ref,
                  qobs_ref, params_ref, out_ref, s_ref, r_ref, uh1_ref,
                  uh2_ref, oh1_ref, oh2_ref, acc_ref, hist_ref=None,
                  masked=False, t_axis=1):
    """Like ``_mse_kernel`` but accumulates the four time-mean sufficient
    statistics [mse, mean_q, mean_q^2, mean_q*qobs] per member -- enough
    for any of the seven metrics host-side (``losses_from_stats``)."""
    tt = pl.program_id(t_axis)
    n_tt = pl.num_programs(t_axis)

    @pl.when(tt == 0)
    def _():
        _init_block(num_uh1, num_uh2, params_ref, s_ref, r_ref, uh1_ref,
                    uh2_ref, oh1_ref, oh2_ref, hist_ref=hist_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # Same chunk-8 treatment as _mse_kernel (one (8, 128) load per
    # series per 8 steps; accumulators in registers across the chunk;
    # 8-step unrolled body for Mosaic's scheduling window).
    def body(i8, _):
        base = i8 * 8
        p8 = prec_ref[pl.ds(base, 8), :]
        e8 = etp_ref[pl.ds(base, 8), :]
        q8 = qobs_ref[pl.ds(base, 8), :]
        accs = [acc_ref[k] for k in range(4)]
        for k in range(8):
            q, _ = _gr4j_step(num_uh1, num_uh2, p8[k:k + 1, :],
                              e8[k:k + 1, :], params_ref, s_ref,
                              r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref)
            qo = q8[k:k + 1, :]
            # Mask the zero-padded tail beyond the true series length
            # (and, in masked mode, NaN observation gaps; the gap rows
            # are zeroed before the diff so the w=0 products stay finite).
            t = tt * t_tile + base + k
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


NUM_PARAM_ROWS = 8  # x1 x2 x3 x4 s0 r0 1/x1 1/x3


def _pack_params(params, s_init, r_init, dtype, s0=None, r0=None):
    """Stack params + precomputed initial stores + reciprocals into
    (8, nB, 8, 128).

    ``s0``/``r0`` (per-member ABSOLUTE store levels, e.g. from a carried
    :class:`~rrmpg_tpu.ops.gr4j.GR4JState`) override the fractional
    ``s_init``/``r_init`` convention when given.  Rows 6/7 carry
    ``1/x1`` / ``1/x3`` so the kernel's per-step divisions by the store
    capacities become multiplies (see ``_gr4j_step``).
    """
    x1 = jnp.asarray(params['x1'], dtype)
    x3 = jnp.asarray(params['x3'], dtype)
    n = x1.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    rows = [x1, params['x2'], x3, params['x4'],
            s_init * x1 if s0 is None else jnp.asarray(s0, dtype),
            (r_init * x3 if r0 is None else jnp.asarray(r0, dtype)),
            1.0 / x1, 1.0 / x3]
    packed = jnp.stack([jnp.asarray(r, dtype) for r in rows])
    packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    return (packed.reshape(NUM_PARAM_ROWS, n_pad // BLOCK, BLOCK_SUBLANES,
                           BLOCK_LANES),
            n, n_pad)


def _pack_series(series, t_tile, dtype):
    """Pad to the tile grid and lane-replicate to (T_pad, 128)."""
    s = jnp.asarray(series, dtype)
    t = s.shape[0]
    t_pad = -(-t // t_tile) * t_tile
    padded = jnp.pad(s, (0, t_pad - t))
    return jnp.broadcast_to(padded[:, None], (t_pad, BLOCK_LANES)), t_pad


@functools.partial(jax.jit, static_argnames=("t_tile", "num_uh1",
                                              "num_uh2", "interpret"))
def gr4j_simulate_pallas(prec, etp, s_init, r_init, params, t_tile=128,
                         num_uh1=NUM_UH1, num_uh2=NUM_UH2,
                         interpret=False):
    """Fused-ensemble GR4J simulation; returns qsim with shape (N, T).

    Args:
        prec, etp: (T,) forcing series.
        s_init, r_init: scalar store initializations (fractions of x1/x3).
        params: dict of (N,) arrays x1..x4.
        t_tile: timesteps per grid step (sets the output-block VMEM size).
            Default 128 measured fastest on v5e across all fused kernels
            (7-9% over 512 -- finer grid steps pipeline the forcing DMA
            better); the sweep plateaus below 128.
        num_uh1, num_uh2: static UH register lengths; must cover
            ceil(x4) / ceil(2*x4+1) for every member (10/21 covers the
            widest published bounds; 3/7 suffices for plain-GR4J bounds
            x4 <= 2.9 and nearly halves the per-step op count).
        interpret: run in Pallas interpreter mode (CPU testing).
    """
    dtype = jnp.asarray(prec).dtype
    packed, n, n_pad = _pack_params(params, jnp.asarray(s_init, dtype),
                                    jnp.asarray(r_init, dtype), dtype)
    prec_b, t_pad = _pack_series(prec, t_tile, dtype)
    etp_b, _ = _pack_series(etp, t_tile, dtype)
    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile

    grid = (n_blocks, n_tt)
    series_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                               memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_traj_kernel, t_tile, num_uh1, num_uh2),
        grid=grid,
        in_specs=[
            series_spec,
            series_spec,
            pl.BlockSpec((NUM_PARAM_ROWS, 1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, t_tile, BLOCK_SUBLANES, BLOCK_LANES),
            lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks, t_pad, BLOCK_SUBLANES, BLOCK_LANES), dtype),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype),      # s
            pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype),      # r
            pltpu.VMEM((num_uh1, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh2, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh1, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh2, BLOCK_SUBLANES, BLOCK_LANES), dtype),
        ],
        interpret=interpret,
    )(prec_b, etp_b, packed)

    # (nB, T_pad, 8, 128) -> (N, T)
    qsim = out.transpose(0, 2, 3, 1).reshape(n_pad, t_pad)
    return qsim[:n, :jnp.asarray(prec).shape[0]]


def _pack_member_rows(arr, n_pad, dtype):
    """(N, K) per-member values -> (K, nB, 8, 128) row blocks (zero pad)."""
    a = jnp.asarray(arr, dtype).T                      # (K, N)
    a = jnp.pad(a, ((0, 0), (0, n_pad - a.shape[1])))
    return a.reshape(a.shape[0], n_pad // BLOCK, BLOCK_SUBLANES,
                     BLOCK_LANES)


@functools.partial(jax.jit, static_argnames=("t_tile", "num_uh1",
                                              "num_uh2", "interpret",
                                              "warm"))
def gr4j_simulate_pallas_state(prec, etp, params, state=None, s_init=0.0,
                               r_init=0.0, t_tile=128, num_uh1=NUM_UH1,
                               num_uh2=NUM_UH2, interpret=False,
                               warm=None):
    """Forecast-mode fused GR4J: returns (qsim (N, T), final GR4JState).

    The Pallas counterpart of ``run_gr4j(return_final=True)`` /
    ``run_gr4j_warm`` (``ops/gr4j.py``): the ensemble state (stores + UH
    registers) stays VMEM-resident through the simulation, enters from a
    carried :class:`~rrmpg_tpu.ops.gr4j.GR4JState` (``state=``, every
    leaf batched over members, ``pr_history`` trimmed host-side to the
    last ``num_uh2 - 1`` inputs) and exits as one ``(2 + H)``-row block
    per member.  Split-invariant against the XLA warm path.

    Args:
        state: (optional) batched GR4JState; cold fractional
            ``s_init``/``r_init`` start if omitted.
        warm: static override of ``state is not None`` (internal; lets
            jit re-tracing key on the static fact, not the pytree).
    """
    dtype = jnp.asarray(prec).dtype
    h = num_uh2 - 1
    if warm is None:
        warm = state is not None
    if warm:
        hist_full = jnp.asarray(state.pr_history, dtype)
        hist = hist_full[:, hist_full.shape[1] - h:]
        packed, n, n_pad = _pack_params(params, 0.0, 0.0, dtype,
                                        s0=state.s, r0=state.r)
    else:
        packed, n, n_pad = _pack_params(params, jnp.asarray(s_init, dtype),
                                        jnp.asarray(r_init, dtype), dtype)
        hist = jnp.zeros((jnp.asarray(params['x1']).shape[0], h), dtype)
    if h == 0:  # degenerate filter depth: keep the input block non-empty
        hist = jnp.zeros((hist.shape[0], 1), dtype)
    hist_b = _pack_member_rows(hist, n_pad, dtype)

    prec_b, t_pad = _pack_series(prec, t_tile, dtype)
    etp_b, _ = _pack_series(etp, t_tile, dtype)
    t_real = jnp.asarray(prec).shape[0]
    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile

    series_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                               memory_space=pltpu.VMEM)
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    out, fstate = pl.pallas_call(
        functools.partial(_traj_final_kernel, t_tile, t_real, num_uh1,
                          num_uh2, warm),
        grid=(n_blocks, n_tt),
        in_specs=[
            series_spec,
            series_spec,
            pl.BlockSpec((NUM_PARAM_ROWS, 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(h, 1), 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile) + tile, lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 + h) + tile, lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, t_pad) + tile, dtype),
            jax.ShapeDtypeStruct((n_blocks, 2 + h) + tile, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(tile, dtype),                     # s
            pltpu.VMEM(tile, dtype),                     # r
            pltpu.VMEM((num_uh1,) + tile, dtype),        # uh1
            pltpu.VMEM((num_uh2,) + tile, dtype),        # uh2
            pltpu.VMEM((num_uh1,) + tile, dtype),        # oh1
            pltpu.VMEM((num_uh2,) + tile, dtype),        # oh2
            pltpu.VMEM((max(h, 1),) + tile, dtype),      # pr history
        ],
        interpret=interpret,
    )(prec_b, etp_b, packed, hist_b)

    qsim = out.transpose(0, 2, 3, 1).reshape(n_pad, t_pad)[:n, :t_real]
    fs = fstate.transpose(1, 0, 2, 3).reshape(2 + h, n_pad)[:, :n]
    from .gr4j import GR4JState
    final = GR4JState(s=fs[0], r=fs[1], pr_history=fs[2:].T)
    return qsim, final


@functools.partial(jax.jit, static_argnames=("t_tile", "num_uh1",
                                              "num_uh2", "interpret",
                                              "stats", "warm", "masked"))
def gr4j_ensemble_mse_pallas(prec, etp, qobs, s_init, r_init, params,
                             t_tile=128, num_uh1=NUM_UH1,
                             num_uh2=NUM_UH2, interpret=False,
                             stats=False, state=None, warm=None,
                             masked=False):
    """Fused GR4J simulate + MSE objective; returns (N,) losses.

    The Monte-Carlo / calibration hot path: per-member squared error
    accumulates in VMEM and only one float per member reaches HBM.

    With ``stats=True``, returns a (4, N) array of time-mean sufficient
    statistics [mse, mean_q, mean_q^2, mean_q*qobs] instead -- enough
    for NSE/KGE/correlation objectives via
    :func:`rrmpg_tpu.ops.pallas_snow.losses_from_stats`, still with
    only four floats per member reaching HBM.

    With ``state`` (a batched :class:`~rrmpg_tpu.ops.gr4j.GR4JState`,
    every leaf carrying the member axis), the objective evaluates a WARM
    continuation -- stores enter at the carried absolute levels and the
    UH registers rebuild from the routing-input history, exactly as in
    :func:`gr4j_simulate_pallas_state` -- the fused path for operational
    recalibration on recent data (``fit(initial_state=,
    engine='pallas')``).  ``warm`` statically overrides
    ``state is not None`` for jit re-trace keying.

    ``masked=True`` (compile-time) treats NaN observations as missing
    data: gap steps are excluded from the accumulations and the result
    normalizes over the valid count (callers detect gaps host-side so
    the gap-free specialization pays nothing).
    """
    _check_t_tile(t_tile)
    dtype = jnp.asarray(prec).dtype
    t_real = jnp.asarray(prec).shape[0]
    h = num_uh2 - 1
    if warm is None:
        warm = state is not None
    if warm:
        hist_full = jnp.asarray(state.pr_history, dtype)
        hist = hist_full[:, hist_full.shape[1] - h:]
        packed, n, n_pad = _pack_params(params, 0.0, 0.0, dtype,
                                        s0=state.s, r0=state.r)
        if h == 0:
            hist = jnp.zeros((hist.shape[0], 1), dtype)
        hist_b = _pack_member_rows(hist, n_pad, dtype)
    else:
        packed, n, n_pad = _pack_params(params, jnp.asarray(s_init, dtype),
                                        jnp.asarray(r_init, dtype), dtype)
    prec_b, t_pad = _pack_series(prec, t_tile, dtype)
    etp_b, _ = _pack_series(etp, t_tile, dtype)
    qobs_b, _ = _pack_series(qobs, t_tile, dtype)
    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile

    series_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                               memory_space=pltpu.VMEM)
    if stats:
        inner = functools.partial(_stats_kernel, t_tile, t_real,
                                  num_uh1, num_uh2, masked=masked)
        out_specs = pl.BlockSpec(
            (1, 4, BLOCK_SUBLANES, BLOCK_LANES),
            lambda b, t: (b, 0, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (n_blocks, 4, BLOCK_SUBLANES, BLOCK_LANES), dtype)
        acc_scratch = pltpu.VMEM((4, BLOCK_SUBLANES, BLOCK_LANES), dtype)
    else:
        inner = functools.partial(_mse_kernel, t_tile, t_real, num_uh1,
                                  num_uh2, masked=masked)
        out_specs = pl.BlockSpec(
            (1, BLOCK_SUBLANES, BLOCK_LANES), lambda b, t: (b, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct(
            (n_blocks, BLOCK_SUBLANES, BLOCK_LANES), dtype)
        acc_scratch = pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype)

    in_specs = [
        series_spec,
        series_spec,
        series_spec,
        pl.BlockSpec((NUM_PARAM_ROWS, 1, BLOCK_SUBLANES, BLOCK_LANES),
                     lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    inputs = [prec_b, etp_b, qobs_b, packed]
    if warm:
        in_specs.append(
            pl.BlockSpec((max(h, 1), 1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(hist_b)

        def kernel(prec_ref, etp_ref, qobs_ref, params_ref, hist_ref,
                   out_ref, *scratch):
            inner(prec_ref, etp_ref, qobs_ref, params_ref, out_ref,
                  *scratch, hist_ref=hist_ref)
    else:
        kernel = inner

    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype),      # s
            pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype),      # r
            pltpu.VMEM((num_uh1, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh2, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh1, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh2, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            acc_scratch,  # sse / 4-row stats accumulator
        ],
        interpret=interpret,
    )(*inputs)

    if masked:
        # The kernel normalized by t_real; renormalize over valid steps.
        scale = t_real / jnp.sum(jnp.isfinite(jnp.asarray(qobs)))
    else:
        scale = 1.0
    if stats:
        return out.transpose(1, 0, 2, 3).reshape(4, n_pad)[:, :n] * scale
    return out.reshape(n_pad)[:n] * scale


def _pack_series_2d(series, t_tile, dtype):
    """(C, T) series -> (C, T_pad, 128) lane-replicated."""
    s = jnp.asarray(series, dtype)
    c, t = s.shape
    t_pad = -(-t // t_tile) * t_tile
    padded = jnp.pad(s, ((0, 0), (0, t_pad - t)))
    return (jnp.broadcast_to(padded[:, :, None], (c, t_pad, BLOCK_LANES)),
            t_pad)


@functools.partial(jax.jit, static_argnames=("t_tile", "num_uh1",
                                              "num_uh2", "interpret",
                                              "masked", "stats"))
def gr4j_regional_mse_pallas(prec, etp, qobs, s_init, r_init, params,
                             t_tile=128, num_uh1=NUM_UH1,
                             num_uh2=NUM_UH2, interpret=False,
                             masked=False, stats=False):
    """Fused regional GR4J MC objective; returns (C, N) losses.

    The (catchment x member) cross product in one Pallas program: a third
    grid dimension walks the catchments while the member tiles and the
    per-(catchment, tile) squared-error accumulator stay VMEM-resident, so
    the one-float-per-(catchment, member) HBM property of the
    single-catchment kernel extends to regional Monte-Carlo sweeps.

    Args:
        prec, etp, qobs: (C, T) per-catchment series.
        s_init, r_init: scalar store initializations (fractions of x1/x3).
        params: dict of (N,) arrays x1..x4, shared across catchments.
        masked: (compile-time) exclude NaN observations -- the masked
            loss normalizes per catchment over its own valid count, so
            ragged discharge records (NaN-padded to rectangular) and
            in-record gaps calibrate correctly.
        stats: return (4, C, N) time-mean sufficient statistics
            [mse, mean_q, mean_q^2, mean_q*qobs] instead of MSE --
            enough for per-catchment NSE/KGE/correlation objectives
            (``pallas_snow.losses_from_stats`` per catchment).
    """
    _check_t_tile(t_tile)
    dtype = jnp.asarray(prec).dtype
    C, T = jnp.asarray(prec).shape
    packed, n, n_pad = _pack_params(params, jnp.asarray(s_init, dtype),
                                    jnp.asarray(r_init, dtype), dtype)
    prec_b, t_pad = _pack_series_2d(prec, t_tile, dtype)
    etp_b, _ = _pack_series_2d(etp, t_tile, dtype)
    qobs_b, _ = _pack_series_2d(qobs, t_tile, dtype)
    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile

    series_spec = pl.BlockSpec((1, t_tile, BLOCK_LANES),
                               lambda c, b, t: (c, t, 0),
                               memory_space=pltpu.VMEM)
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    if stats:
        def kernel(prec_ref, etp_ref, qobs_ref, params_ref, out_ref,
                   *scratch):
            _stats_kernel(t_tile, T, num_uh1, num_uh2, prec_ref.at[0],
                          etp_ref.at[0], qobs_ref.at[0], params_ref,
                          out_ref.at[0], *scratch, t_axis=2,
                          masked=masked)
        out_specs = pl.BlockSpec((1, 1, 4) + tile,
                                 lambda c, b, t: (c, b, 0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, n_blocks, 4) + tile, dtype)
        acc_scratch = pltpu.VMEM((4,) + tile, dtype)
    else:
        def kernel(prec_ref, etp_ref, qobs_ref, params_ref, out_ref,
                   *scratch):
            _mse_kernel(t_tile, T, num_uh1, num_uh2, prec_ref.at[0],
                        etp_ref.at[0], qobs_ref.at[0], params_ref,
                        out_ref.at[0], *scratch, t_axis=2,
                        masked=masked)
        out_specs = pl.BlockSpec((1, 1) + tile,
                                 lambda c, b, t: (c, b, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((C, n_blocks) + tile, dtype)
        acc_scratch = pltpu.VMEM(tile, dtype)

    out = pl.pallas_call(
        kernel,
        grid=(C, n_blocks, n_tt),
        in_specs=[
            series_spec,
            series_spec,
            series_spec,
            pl.BlockSpec((NUM_PARAM_ROWS, 1, BLOCK_SUBLANES, BLOCK_LANES),
                         lambda c, b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype),      # s
            pltpu.VMEM((BLOCK_SUBLANES, BLOCK_LANES), dtype),      # r
            pltpu.VMEM((num_uh1, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh2, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh1, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            pltpu.VMEM((num_uh2, BLOCK_SUBLANES, BLOCK_LANES), dtype),
            acc_scratch,  # sse / 4-row stats accumulator
        ],
        interpret=interpret,
    )(prec_b, etp_b, qobs_b, packed)

    if stats:
        out = out.transpose(0, 2, 1, 3, 4).reshape(C, 4, n_pad)[:, :, :n]
    else:
        out = out.reshape(C, n_pad)[:, :n]
    if masked:
        # Renormalize each catchment over its own valid-step count.
        n_valid = jnp.sum(jnp.isfinite(jnp.asarray(qobs)), axis=1)
        scale = (T / n_valid)[:, None, None] if stats else \
            (T / n_valid)[:, None]
        out = out * scale
    if stats:
        return out.transpose(1, 0, 2)                  # (4, C, N)
    return out
