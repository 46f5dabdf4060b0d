"""Fused Pallas kernels for the coupled snow + GR4J model family.

One kernel template covers all four compositions of the reference
(``run_cemaneigegr4j``, ``run_cemaneigehystgr4j``, ``run_cemaneigegr4jice``,
``run_cemaneigehystgr4jice``) in their Monte-Carlo / calibration form:
simulate the full coupled model for an (8, 128)-member tile and accumulate
the squared error against observations in VMEM, writing one float per
member.  The elevation-layer axis is a *static* unrolled loop over
per-layer (1, 128) forcing slices; all snowpack state (G, eTG, and for the
hysteresis variant SCA and the SWE maximum) lives in VMEM scratch
alongside the GR4J stores and UH registers.

Variant flags (``hyst``, ``ice``) are compile-time; parameters and global
scalars ride in a fixed row layout so one packing routine serves every
variant.  Math follows the reference compositions exactly
(``rrmpg/models/cemaneigegr4j_model.py:56-63`` and siblings).
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
    _check_t_tile,
    _gr4j_step,
    _init_block,
    _pack_member_rows,
    _pack_series as _pack_flat_series,
)
from .uh import NUM_UH1, NUM_UH2

# Parameter-row layout (rows of the packed (R, nB, 8, 128) array).
_R_CTG, _R_KF, _R_THACC, _R_RSP = 0, 1, 2, 3
_R_X1, _R_X2, _R_X3, _R_X4, _R_DDF = 4, 5, 6, 7, 8
_R_S0, _R_R0, _R_SNOW0, _R_TH0 = 9, 10, 11, 12
# Pack-time reciprocals: per-step divisions by the (constant-per-member)
# store capacities / accumulation threshold become multiplies (~5x
# cheaper on the VPU; see _gr4j_step).  1/0 = inf rows are packed but
# never read when the corresponding parameter is absent (snow_only /
# non-hysteresis variants).
_R_IX1, _R_IX3, _R_ITHACC = 13, 14, 15
_R_LAYER0 = 16  # then L rows of g_thresh/psol_annual, then L of frac_ice


def _snow_step_layer(l, first, snow_l, rain_l, temp_l, G_ref, eTG_ref,
                     sca_ref, swe_ref, params_ref, hyst):
    """Advance one elevation layer one timestep; returns (liquid, G).

    ``first`` is the t==0 cold-start predicate; pass ``None`` for a warm
    continuation (state refs pre-initialized, no step is ever "first" --
    the static specialization the warm XLA kernels use via
    ``first_t=False``, ``ops/cemaneige.py:118``).
    """
    CTG = params_ref[_R_CTG, 0]
    Kf = params_ref[_R_KF, 0]

    if first is None:
        g = G_ref[l] + snow_l
        th = CTG * eTG_ref[l] + (1.0 - CTG) * temp_l
    else:
        snow0 = params_ref[_R_SNOW0, 0]
        th0 = params_ref[_R_TH0, 0]
        g = jnp.where(first, snow0, G_ref[l] + snow_l)
        th = jnp.where(first, th0,
                       CTG * eTG_ref[l] + (1.0 - CTG) * temp_l)
    th = jnp.minimum(th, 0.0)
    melting = (th == 0.0) & (temp_l > 0.0)
    pot_melt = jnp.where(melting, jnp.minimum(Kf * temp_l, g), 0.0)

    if hyst:
        Thacc = params_ref[_R_THACC, 0]
        Rsp = params_ref[_R_RSP, 0]
        psol = params_ref[_R_LAYER0 + l, 0]
        th_melt = psol * Rsp

        balance = snow_l - pot_melt
        accumulating = balance >= 0.0
        if first is None:
            sca_prev = sca_ref[l]
            swe_prev = swe_ref[l]
        else:
            sca_prev = jnp.where(first, 0.0, sca_ref[l])
            swe_prev = jnp.where(first, 0.0, swe_ref[l])
        sca_acc = sca_prev + balance * params_ref[_R_ITHACC, 0]
        th_max = jnp.minimum(swe_prev, th_melt)
        sca_abl = jnp.where(th_max > 0.0,
                            g / jnp.where(th_max > 0.0, th_max, 1.0), 0.0)
        sca = jnp.clip(jnp.where(accumulating, sca_acc, sca_abl), 0.0, 1.0)
        swe = jnp.where(accumulating, jnp.maximum(swe_prev, g), swe_prev)

        melt = jnp.minimum((0.9 * sca + 0.1) * pot_melt, g)
        g = g - melt
        swe = jnp.where(g == 0.0, 0.0, swe)
        sca_ref[l] = sca
        swe_ref[l] = swe
    else:
        g_thresh = params_ref[_R_LAYER0 + l, 0]
        safe = jnp.where(g_thresh > 0.0, g_thresh, 1.0)
        ratio = jnp.where(g < g_thresh, g / safe, 1.0)
        melt = (0.9 * ratio + 0.1) * pot_melt
        g = g - melt

    G_ref[l] = g
    eTG_ref[l] = th
    return rain_l + melt, g


def _make_kernel(t_tile, t_real, num_layers, num_uh1, num_uh2, hyst, ice,
                 stats=False, sca_stats=False, traj=False,
                 snow_only=False, t_axis=1, warm=False, masked=False):
    def kernel(*refs):
        hist_ref = None
        if traj:
            (snow_ref, rain_ref, temp_ref, etp_ref, params_ref, out_ref,
             s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref, G_ref,
             eTG_ref, sca_ref, swe_ref, sse_ref) = refs
            qobs_ref = ndsi_ref = None
        elif sca_stats:
            (snow_ref, rain_ref, temp_ref, etp_ref, qobs_ref, ndsi_ref,
             params_ref, out_ref, s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref,
             oh2_ref, G_ref, eTG_ref, sca_ref, swe_ref, sse_ref) = refs
        elif warm:
            (snow_ref, rain_ref, temp_ref, etp_ref, qobs_ref, params_ref,
             hist_ref, out_ref, s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref,
             oh2_ref, G_ref, eTG_ref, sca_ref, swe_ref, sse_ref) = refs
            ndsi_ref = None
        else:
            (snow_ref, rain_ref, temp_ref, etp_ref, qobs_ref, params_ref,
             out_ref, s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref, oh2_ref,
             G_ref, eTG_ref, sca_ref, swe_ref, sse_ref) = refs
            ndsi_ref = None
        tt = pl.program_id(t_axis)
        n_tt = pl.num_programs(t_axis)

        @pl.when(tt == 0)
        def _():
            if not snow_only:
                # GR4J rows sit at _R_X1.., so _init_block's fixed offsets
                # (x4 at row 3, inits at rows 4/5) are re-mapped via a view.
                _init_gr4j_rows(params_ref, s_ref, r_ref, uh1_ref, uh2_ref,
                                oh1_ref, oh2_ref, num_uh1, num_uh2,
                                hist_ref=hist_ref)
            if warm:
                # Warm calibration entry: per-layer snow state from the
                # packed state rows (same layout as _make_state_kernel).
                state0 = _R_LAYER0 + 2 * num_layers
                for l in range(num_layers):
                    G_ref[l] = params_ref[state0 + l, 0]
                    eTG_ref[l] = params_ref[state0 + num_layers + l, 0]
                    sca_ref[l] = params_ref[state0 + 2 * num_layers + l,
                                            0]
                    swe_ref[l] = params_ref[state0 + 3 * num_layers + l,
                                            0]
            if not traj:
                n_acc = (4 + 4 * num_layers) if sca_stats else (
                    4 if stats else 1)
                for k in range(n_acc):
                    sse_ref[k] = jnp.zeros(
                        (BLOCK_SUBLANES, BLOCK_LANES),
                        dtype=sse_ref.dtype)

        series_refs = {'snow': snow_ref, 'rain': rain_ref,
                       'temp': temp_ref, 'etp': etp_ref}

        def step(i_or_rows, first):
            """One composition timestep on the member tile; returns q."""
            if traj:
                i = i_or_rows
                get = lambda name, l: series_refs[name][l, pl.ds(i, 1), :]
                get_flat = lambda name: series_refs[name][pl.ds(i, 1), :]
            else:
                rows, k = i_or_rows
                get = lambda name, l: rows[name][l][k:k + 1, :]
                get_flat = lambda name: rows[name][0][k:k + 1, :]
            liquid_sum = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES),
                                   dtype=s_ref.dtype)
            icemelt_sum = jnp.zeros_like(liquid_sum)
            for l in range(num_layers):
                snow_l = get('snow', l)
                rain_l = get('rain', l)
                temp_l = get('temp', l)
                liquid, g = _snow_step_layer(
                    l, first, snow_l, rain_l, temp_l, G_ref, eTG_ref,
                    sca_ref, swe_ref, params_ref, hyst)
                liquid_sum += liquid
                if ice:
                    ddf = params_ref[_R_DDF, 0]
                    frac = params_ref[_R_LAYER0 + num_layers + l, 0]
                    melt = jnp.maximum(ddf * temp_l, 0.0)
                    icemelt_sum += jnp.where(g > 1.0, 0.0, melt) * frac

            p = liquid_sum / float(num_layers)
            if ice:
                p = p + icemelt_sum
            if snow_only:
                # Standalone Cemaneige: the catchment outflow IS the
                # layer-mean liquid (rain + melt); no runoff routing.
                q = p
            else:
                e = get_flat('etp')
                q, _ = _gr4j_step_rows(num_uh1, num_uh2, p, e,
                                       params_ref, s_ref, r_ref, uh1_ref,
                                       uh2_ref, oh1_ref, oh2_ref)
            return q

        if traj:
            def body(i, _):
                t = tt * t_tile + i
                q = step(i, None if warm else t == 0)
                out_ref[0, i] = q
                return ()

            lax.fori_loop(0, t_tile, body, (), unroll=False)
        else:
            n_acc = (4 + 4 * num_layers) if sca_stats else (
                4 if stats else 1)

            # Time loop chunked by 8: one (8, 128) dynamic-sublane load
            # per series per 8 steps (static row extracts inside the
            # chunk) instead of per-step (1, 128) loads, 8x fewer
            # fori_loop iterations, and the accumulators held in
            # registers across the chunk.  Measured at 1.61x on the
            # hyst+ice flagship (94.7 -> 58.9 ms at 131072 x 3651 x 5L)
            # -- mostly the larger Mosaic scheduling window of the
            # 8-step unrolled body (same effect measured at 1.65x on
            # the GR4J kernel), plus the removed 3L+2 per-step loads.
            def body(i8, _):
                base = i8 * 8
                rows = {
                    name: [series_refs[name][l, pl.ds(base, 8), :]
                           for l in range(num_layers)]
                    for name in ('snow', 'rain', 'temp')
                }
                if not snow_only:
                    rows['etp'] = [etp_ref[pl.ds(base, 8), :]]
                qobs8 = qobs_ref[pl.ds(base, 8), :]
                if sca_stats:
                    ndsi8 = [ndsi_ref[l, pl.ds(base, 8), :]
                             for l in range(num_layers)]
                accs = [sse_ref[k] for k in range(n_acc)]
                for k in range(8):
                    t = tt * t_tile + base + k
                    q = step((rows, k), None if warm else t == 0)
                    qo = qobs8[k:k + 1, :]
                    valid_t = t < t_real
                    if masked:
                        # NaN observations mark missing-data gaps: zero
                        # the gap rows before the products and drop them
                        # from the mask (each series masks by its OWN
                        # gaps -- discharge here, NDSI per band below).
                        finite = qo == qo
                        qo = jnp.where(finite, qo, 0.0)
                        valid = valid_t & finite
                    else:
                        valid = valid_t
                    diff = q - qo
                    accs[0] += jnp.where(valid, diff * diff, 0.0)
                    if stats or sca_stats:
                        # Sufficient statistics for KGE/NSE/correlation.
                        accs[1] += jnp.where(valid, q, 0.0)
                        accs[2] += jnp.where(valid, q * q, 0.0)
                        accs[3] += jnp.where(valid, q * qo, 0.0)
                    if sca_stats:
                        # Per-elevation-band statistics of 100*SCA vs
                        # NDSI for the multi-objective Q+SCA calibration.
                        for l in range(num_layers):
                            s100 = 100.0 * sca_ref[l]
                            nd = ndsi8[l][k:k + 1, :]
                            if masked:
                                nd_fin = nd == nd
                                nd = jnp.where(nd_fin, nd, 0.0)
                                v2 = valid_t & nd_fin
                            else:
                                v2 = valid_t
                            d = s100 - nd
                            b4 = 4 + 4 * l
                            accs[b4] += jnp.where(v2, d * d, 0.0)
                            accs[b4 + 1] += jnp.where(v2, s100, 0.0)
                            accs[b4 + 2] += jnp.where(v2, s100 * s100,
                                                      0.0)
                            accs[b4 + 3] += jnp.where(v2, s100 * nd,
                                                      0.0)
                for k in range(n_acc):
                    sse_ref[k] = accs[k]
                return ()

            lax.fori_loop(0, t_tile // 8, body, (), unroll=False)

        if not traj:
            @pl.when(tt == n_tt - 1)
            def _():
                n_acc = (4 + 4 * num_layers) if sca_stats else (
                    4 if stats else 1)
                if n_acc > 1:
                    for k in range(n_acc):
                        out_ref[0, k] = sse_ref[k] / t_real
                else:
                    out_ref[0, 0] = sse_ref[0] / t_real

    return kernel


class _RowView:
    """Re-maps the GR4J helpers' fixed row indices onto the family layout
    (x1..x4 at rows 4..7, initial stores at rows 9/10)."""

    _MAP = {0: _R_X1, 1: _R_X2, 2: _R_X3, 3: _R_X4, 4: _R_S0, 5: _R_R0,
            6: _R_IX1, 7: _R_IX3}

    def __init__(self, ref):
        self._ref = ref
        self.dtype = ref.dtype

    def __getitem__(self, idx):
        row, rest = idx
        return self._ref[self._MAP[row], rest]


def _gr4j_step_rows(num_uh1, num_uh2, p, e, params_ref, *refs):
    return _gr4j_step(num_uh1, num_uh2, p, e, _RowView(params_ref), *refs)


def _init_gr4j_rows(params_ref, s_ref, r_ref, uh1_ref, uh2_ref, oh1_ref,
                    oh2_ref, num_uh1, num_uh2, hist_ref=None):
    _init_block(num_uh1, num_uh2, _RowView(params_ref), s_ref, r_ref,
                uh1_ref, uh2_ref, oh1_ref, oh2_ref, hist_ref=hist_ref)


def _make_state_kernel(t_tile, t_real, num_layers, num_uh1, num_uh2,
                       hyst, ice, warm):
    """Forecast-mode trajectory kernel for the snow + GR4J family.

    Like the ``traj`` mode of :func:`_make_kernel` plus state entry/exit:
    with ``warm``, the per-layer snow states and the GR4J stores/UH
    registers initialize from the packed state rows / routing-input
    history (no step is "first"); the end-of-series state is captured
    inside the time loop at the last real step (padded tail steps run on
    but cannot corrupt the snapshot) and written as one
    ``(2 + H + 4L)``-row block per member: ``[s, r, hist.., G.., eTG..,
    sca.., swe_max..]``.
    """
    h = num_uh2 - 1

    def kernel(snow_ref, rain_ref, temp_ref, etp_ref, params_ref,
               hist_ref, out_ref, fstate_ref, s_ref, r_ref, uh1_ref,
               uh2_ref, oh1_ref, oh2_ref, G_ref, eTG_ref, sca_ref,
               swe_ref, hist_scratch):
        tt = pl.program_id(1)
        state0 = _R_LAYER0 + 2 * num_layers  # first snow-state row

        @pl.when(tt == 0)
        def _():
            _init_gr4j_rows(params_ref, s_ref, r_ref, uh1_ref, uh2_ref,
                            oh1_ref, oh2_ref, num_uh1, num_uh2,
                            hist_ref=hist_ref if warm else None)
            for j in range(h):
                hist_scratch[j] = (hist_ref[j, 0] if warm
                                   else jnp.zeros_like(s_ref[...]))
            if warm:
                for l in range(num_layers):
                    G_ref[l] = params_ref[state0 + l, 0]
                    eTG_ref[l] = params_ref[state0 + num_layers + l, 0]
                    sca_ref[l] = params_ref[state0 + 2 * num_layers + l,
                                            0]
                    swe_ref[l] = params_ref[state0 + 3 * num_layers + l,
                                            0]

        def body(i, _):
            t = tt * t_tile + i
            first = None if warm else (t == 0)
            liquid_sum = jnp.zeros((BLOCK_SUBLANES, BLOCK_LANES),
                                   dtype=s_ref.dtype)
            icemelt_sum = jnp.zeros_like(liquid_sum)
            for l in range(num_layers):
                snow_l = snow_ref[l, pl.ds(i, 1), :]
                rain_l = rain_ref[l, pl.ds(i, 1), :]
                temp_l = temp_ref[l, pl.ds(i, 1), :]
                liquid, g = _snow_step_layer(
                    l, first, snow_l, rain_l, temp_l, G_ref, eTG_ref,
                    sca_ref, swe_ref, params_ref, hyst)
                liquid_sum += liquid
                if ice:
                    ddf = params_ref[_R_DDF, 0]
                    frac = params_ref[_R_LAYER0 + num_layers + l, 0]
                    melt = jnp.maximum(ddf * temp_l, 0.0)
                    icemelt_sum += jnp.where(g > 1.0, 0.0, melt) * frac

            p = liquid_sum / float(num_layers)
            if ice:
                p = p + icemelt_sum
            e = etp_ref[pl.ds(i, 1), :]
            q, p_r = _gr4j_step_rows(num_uh1, num_uh2, p, e, params_ref,
                                     s_ref, r_ref, uh1_ref, uh2_ref,
                                     oh1_ref, oh2_ref)
            out_ref[0, i] = q
            for j in range(h - 1):
                hist_scratch[j] = hist_scratch[j + 1]
            if h > 0:
                hist_scratch[h - 1] = jnp.broadcast_to(
                    p_r, hist_scratch[h - 1].shape)

            @pl.when(t == t_real - 1)
            def _():
                fstate_ref[0, 0] = s_ref[...]
                fstate_ref[0, 1] = r_ref[...]
                for j in range(h):
                    fstate_ref[0, 2 + j] = hist_scratch[j]
                for l in range(num_layers):
                    fstate_ref[0, 2 + h + l] = G_ref[l]
                    fstate_ref[0, 2 + h + num_layers + l] = eTG_ref[l]
                    if hyst:
                        fstate_ref[0, 2 + h + 2 * num_layers + l] = \
                            sca_ref[l]
                        fstate_ref[0, 2 + h + 3 * num_layers + l] = \
                            swe_ref[l]
                    else:
                        zero = jnp.zeros_like(s_ref[...])
                        fstate_ref[0, 2 + h + 2 * num_layers + l] = zero
                        fstate_ref[0, 2 + h + 3 * num_layers + l] = zero

            return ()

        lax.fori_loop(0, t_tile, body, (), unroll=False)

    return kernel


def _pack_family_params(params, s_init, r_init, snow_pack_init,
                        thermal_state_init, layer_consts, frac_ice, dtype,
                        s0=None, r0=None, snow_state=None):
    """Stack the family row layout into (R, nB, 8, 128).

    ``layer_consts`` may be ``(L,)`` (shared, cold start) or ``(N, L)``
    (per-member, carried from a state bundle).  ``s0``/``r0`` override
    the fractional GR4J store inits with per-member absolute levels, and
    ``snow_state`` (a ``(G, eTG, sca, swe_max)`` tuple of ``(N, L)``
    arrays) appends ``4L`` warm snow-state rows after the frac_ice rows.
    """
    x1 = jnp.asarray(params['x1'], dtype)
    n = x1.shape[0]
    n_pad = -(-n // BLOCK) * BLOCK
    layer_consts = jnp.asarray(layer_consts, dtype)
    L = layer_consts.shape[-1]

    def row(key):
        if key in params:
            return jnp.asarray(params[key], dtype)
        return jnp.zeros(n, dtype)

    def recip(x):
        # A zero row means the parameter is absent in this variant
        # (``row`` packs zeros) and its reciprocal row is never read by
        # the kernel; guard so the packed block stays finite (inf rows
        # would poison any future variant that read them unconditionally
        # and trip blanket-finiteness debugging checks).
        return jnp.where(x != 0.0, 1.0 / jnp.where(x != 0.0, x, 1.0), 0.0)

    ones_n = jnp.ones(n, dtype)
    rows = [row('CTG'), row('Kf'), row('Thacc'), row('Rsp'),
            x1, row('x2'), row('x3'), row('x4'), row('DDF'),
            s_init * x1 if s0 is None else jnp.asarray(s0, dtype),
            (r_init * jnp.asarray(params['x3'], dtype) if r0 is None
             else jnp.asarray(r0, dtype)),
            snow_pack_init * ones_n, thermal_state_init * ones_n,
            recip(x1), recip(row('x3')), recip(row('Thacc'))]
    if layer_consts.ndim == 2:
        rows += [layer_consts[:, l] for l in range(L)]
    else:
        rows += [layer_consts[l] * ones_n for l in range(L)]
    fi = (jnp.zeros(L, dtype) if frac_ice is None
          else jnp.asarray(frac_ice, dtype))
    rows += [fi[l] * ones_n for l in range(L)]
    if snow_state is not None:
        for leaf in snow_state:                        # G, eTG, sca, swe
            arr = jnp.asarray(leaf, dtype)
            rows += [arr[:, l] for l in range(L)]
    packed = jnp.stack(rows)
    packed = jnp.pad(packed, ((0, 0), (0, n_pad - n)), constant_values=1.0)
    R = packed.shape[0]
    return (packed.reshape(R, n_pad // BLOCK, BLOCK_SUBLANES, BLOCK_LANES),
            n, n_pad, R)


def _pack_layer_series(series, t_tile, dtype):
    """(T, L) series -> (L, T_pad, 128) lane-replicated per layer."""
    s = jnp.asarray(series, dtype)
    t, L = s.shape
    t_pad = -(-t // t_tile) * t_tile
    padded = jnp.pad(s, ((0, t_pad - t), (0, 0))).T  # (L, T_pad)
    return (jnp.broadcast_to(padded[:, :, None],
                             (L, t_pad, BLOCK_LANES)), t_pad)


@functools.partial(jax.jit, static_argnames=(
    "hyst", "ice", "stats", "sca_stats", "snow_only", "t_tile", "num_uh1",
    "num_uh2", "interpret", "warm", "masked"))
def snowgr4j_ensemble_mse_pallas(prec, mean_temp, etp, frac_solid_prec,
                                 qobs, snow_pack_init, thermal_state_init,
                                 s_init, r_init, params, frac_ice=None,
                                 ndsi=None, hyst=False, ice=False,
                                 stats=False, sca_stats=False,
                                 snow_only=False, t_tile=128,
                                 num_uh1=NUM_UH1, num_uh2=NUM_UH2,
                                 interpret=False, state=None, warm=None,
                                 masked=False):
    """Fused coupled-model ensemble MSE; returns (N,) losses.

    With ``stats=True``, returns a (4, N) array of time-mean sufficient
    statistics [mse, mean(q), mean(q^2), mean(q*qobs)] from which
    KGE/NSE/correlation objectives are computed with
    :func:`losses_from_stats` -- still one device pass, no trajectories.

    With ``sca_stats=True`` (requires ``hyst=True`` and ``ndsi`` of shape
    (L, T)), returns (4 + 4*L, N): the discharge statistics followed by
    per-band statistics of 100*SCA vs NDSI for the multi-objective Q+SCA
    calibration (combine with :func:`q_sca_loss_from_stats`).

    Args:
        prec, mean_temp, frac_solid_prec: (T, L) layer forcing.
        etp, qobs: (T,) series.
        snow_pack_init, thermal_state_init, s_init, r_init: scalars
            (reference init conventions).
        params: dict of (N,) arrays -- CTG, Kf, x1..x4 and, per variant,
            Thacc/Rsp (hyst) and DDF (ice).
        frac_ice: (L,) glacier fractions (ice variants).
        hyst, ice: compile-time variant selectors.
        state: (optional) batched
            :class:`~rrmpg_tpu.models.states.SnowGR4JState` (every leaf
            carrying the member axis) -- the objective evaluates a WARM
            continuation: snowpack/GR4J state enters the kernel's VMEM
            from the bundle and the series-derived layer constants come
            from the ORIGINAL series (carried in the bundle), never
            recomputed from this (shorter) segment.  The fused path for
            ``fit(initial_state=, engine='pallas')``.  ``warm``
            statically overrides ``state is not None``.
        masked: (compile-time) treat NaN observations as missing-data
            gaps -- excluded from the accumulations, each series by its
            own gaps (discharge and, with ``sca_stats``, each NDSI
            band), with the means renormalized over the valid counts.
    """
    _check_t_tile(t_tile)
    dtype = jnp.asarray(prec).dtype
    prec = jnp.asarray(prec, dtype)
    frac = jnp.asarray(frac_solid_prec, dtype)
    snow = prec * frac
    rain = prec - snow
    T, L = prec.shape
    h = num_uh2 - 1
    if warm is None:
        warm = state is not None

    if warm:
        if sca_stats:
            raise ValueError(
                "Warm (state=) evaluation supports the mse/stats "
                "objectives; Q+SCA calibration from a carried state "
                "runs on engine='xla'.")
        sg = state.snow
        layer_consts = sg.psol_annual if hyst else sg.g_thresh  # (N, L)
        if hyst:
            snow_state = (sg.g, sg.etg, sg.sca, sg.swe_max)
        else:
            zeros_nl = jnp.zeros_like(jnp.asarray(sg.g, dtype))
            snow_state = (sg.g, sg.etg, zeros_nl, zeros_nl)
        hist_full = jnp.asarray(state.gr4j.pr_history, dtype)
        hist = hist_full[:, hist_full.shape[1] - h:]
        packed, n, n_pad, R = _pack_family_params(
            params, 0.0, 0.0, jnp.asarray(snow_pack_init, dtype),
            jnp.asarray(thermal_state_init, dtype), layer_consts,
            frac_ice, dtype, s0=state.gr4j.s, r0=state.gr4j.r,
            snow_state=snow_state)
        if h == 0:
            hist = jnp.zeros((hist.shape[0], 1), dtype)
        hist_b = _pack_member_rows(hist, n_pad, dtype)
    else:
        # Per-layer series constant: snow-cover threshold (plain) or mean
        # annual solid precipitation (hysteresis).
        psol = 365.25 * jnp.mean(snow, axis=0)
        layer_consts = 0.9 * psol if not hyst else psol

        packed, n, n_pad, R = _pack_family_params(
            params, jnp.asarray(s_init, dtype), jnp.asarray(r_init, dtype),
            jnp.asarray(snow_pack_init, dtype),
            jnp.asarray(thermal_state_init, dtype), layer_consts, frac_ice,
            dtype)

    if sca_stats and not hyst:
        raise ValueError("sca_stats requires the hysteresis variant.")
    snow_b, t_pad = _pack_layer_series(snow, t_tile, dtype)
    rain_b, _ = _pack_layer_series(rain, t_tile, dtype)
    temp_b, _ = _pack_layer_series(mean_temp, t_tile, dtype)
    etp_b, _ = _pack_flat_series(etp, t_tile, dtype)
    qobs_b, _ = _pack_flat_series(qobs, t_tile, dtype)
    if sca_stats:
        ndsi_b, _ = _pack_layer_series(jnp.asarray(ndsi, dtype).T, t_tile,
                                       dtype)

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile

    layer_spec = pl.BlockSpec((L, t_tile, BLOCK_LANES),
                              lambda b, t: (0, t, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                             memory_space=pltpu.VMEM)
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    n_acc = (4 + 4 * L) if sca_stats else (4 if stats else 1)
    kernel = _make_kernel(t_tile, T, L, num_uh1, num_uh2, hyst, ice,
                          stats=stats, sca_stats=sca_stats,
                          snow_only=snow_only, warm=warm, masked=masked)
    in_specs = [layer_spec, layer_spec, layer_spec, flat_spec, flat_spec]
    inputs = [snow_b, rain_b, temp_b, etp_b, qobs_b]
    if sca_stats:
        in_specs.append(layer_spec)
        inputs.append(ndsi_b)
    in_specs.append(
        pl.BlockSpec((R, 1) + tile, lambda b, t: (0, b, 0, 0),
                     memory_space=pltpu.VMEM))
    inputs.append(packed)
    if warm:
        in_specs.append(
            pl.BlockSpec((max(h, 1), 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM))
        inputs.append(hist_b)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, n_acc) + tile, lambda b, t: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, n_acc) + tile, dtype),
        scratch_shapes=[
            pltpu.VMEM(tile, dtype),                 # s store
            pltpu.VMEM(tile, dtype),                 # r store
            pltpu.VMEM((num_uh1,) + tile, dtype),    # uh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # uh2
            pltpu.VMEM((num_uh1,) + tile, dtype),    # oh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # oh2
            pltpu.VMEM((L,) + tile, dtype),          # G
            pltpu.VMEM((L,) + tile, dtype),          # eTG
            pltpu.VMEM((L,) + tile, dtype),          # sca
            pltpu.VMEM((L,) + tile, dtype),          # swe_max
            pltpu.VMEM((n_acc,) + tile, dtype),      # accumulators
        ],
        interpret=interpret,
    )(*inputs)

    out = out.transpose(1, 0, 2, 3).reshape(n_acc, n_pad)[:, :n]
    if masked:
        # The kernel normalized by T; renormalize each statistics row
        # over its own series' valid-step count.
        q_scale = T / jnp.sum(jnp.isfinite(jnp.asarray(qobs)))
        if sca_stats:
            nd_scale = T / jnp.sum(
                jnp.isfinite(jnp.asarray(ndsi, dtype)), axis=1)  # (L,)
            scale = jnp.concatenate(
                [jnp.full((4,), q_scale, dtype),
                 jnp.repeat(nd_scale.astype(dtype), 4)])
            out = out * scale[:, None]
        else:
            out = out * q_scale
    if stats or sca_stats:
        return out
    return out[0]


def losses_from_stats(stats, qobs):
    """Compute objective values from fused-kernel sufficient statistics.

    Args:
        stats: (4, N) array [mse, mean_q, mean_q2, mean_q_qobs] as returned
            by ``snowgr4j_ensemble_mse_pallas(..., stats=True)``.
        qobs: (T,) observations.

    Returns:
        dict with (N,) arrays: 'mse', 'rmse', 'nse', 'kge', 'alpha', 'beta',
        'r' (KGE decomposition follows ``rrmpg/utils/metrics.py:182-188``).

    NaN observations (missing-data gaps) are excluded from the
    observation moments, matching the masked kernel statistics
    (``masked=True`` on the fused kernels normalizes the member
    statistics over the same valid steps).
    """
    qobs = jnp.asarray(qobs, stats.dtype)
    w = jnp.isfinite(qobs).astype(stats.dtype)
    qobs0 = jnp.where(w > 0, qobs, 0.0)
    n = jnp.sum(w)
    mean_obs = jnp.sum(w * qobs0) / n
    var_obs = jnp.sum(w * qobs0 * qobs0) / n - mean_obs * mean_obs
    std_obs = jnp.sqrt(jnp.maximum(var_obs, 0.0))

    mse_v, mean_q, mean_q2, mean_qo = stats
    var_q = jnp.maximum(mean_q2 - mean_q * mean_q, 0.0)
    std_q = jnp.sqrt(var_q)
    cov = mean_qo - mean_q * mean_obs
    r = cov / (std_q * std_obs)
    alpha = std_q / std_obs
    beta = mean_q / mean_obs
    kge = 1.0 - jnp.sqrt((r - 1.0) ** 2 + (alpha - 1.0) ** 2 +
                         (beta - 1.0) ** 2)
    nse = 1.0 - mse_v / var_obs
    return {'mse': mse_v, 'rmse': jnp.sqrt(mse_v), 'nse': nse, 'kge': kge,
            'alpha': alpha, 'beta': beta, 'r': r}


def q_sca_loss_from_stats(stats, qobs, ndsi, loss_metric="mse"):
    """Multi-objective Q+SCA loss from fused-kernel statistics.

    Implements the reference weighting (0.75 on discharge, 0.05 per
    elevation band, ``rrmpg/models/cemaneigehystgr4j.py:663-689``) with
    'mse', or 'kge' minimizing ``1 - KGE`` per term.

    Args:
        stats: (4 + 4*L, N) array from
            ``snowgr4j_ensemble_mse_pallas(..., sca_stats=True)``.
        qobs: (T,) observed discharge.
        ndsi: (L, T) observed NDSI bands.

    Returns:
        (N,) combined losses.
    """
    loss_q, loss_sca = q_sca_components_from_stats(stats, qobs, ndsi,
                                                   loss_metric)
    return 0.75 * loss_q + 0.05 * loss_sca


def q_sca_components_from_stats(stats, qobs, ndsi, loss_metric="mse"):
    """Separate (L_q, L_sca) components from fused-kernel statistics.

    Same statistics as :func:`q_sca_loss_from_stats` but without the
    reference's fixed weighting -- the bi-objective form that
    ``fit_Q_SCA(pareto=True)`` optimizes with NSGA-II.  ``L_sca`` is the
    sum over the elevation bands (the unweighted analog of the
    reference's ``sum_b L(NDSI_b, 100 sca_b)``).

    Returns:
        ``(loss_q, loss_sca)``, each ``(N,)``.
    """
    L = (stats.shape[0] - 4) // 4
    q_losses = losses_from_stats(stats[:4], qobs)
    if loss_metric == "mse":
        loss_q = q_losses['mse']
        loss_sca = sum(stats[4 + 4 * l] for l in range(L))
        return loss_q, loss_sca
    if loss_metric == "kge":
        loss_q = 1.0 - q_losses['kge']
        loss_sca = sum(
            1.0 - losses_from_stats(stats[4 + 4 * l:8 + 4 * l],
                                    ndsi[l])['kge']
            for l in range(L))
        return loss_q, loss_sca
    raise ValueError(
        f"Unsupported loss_metric {loss_metric!r}; supported: 'mse', 'kge'.")


@functools.partial(jax.jit, static_argnames=(
    "hyst", "ice", "snow_only", "t_tile", "num_uh1", "num_uh2",
    "interpret"))
def snowgr4j_simulate_pallas(prec, mean_temp, etp, frac_solid_prec,
                             snow_pack_init, thermal_state_init, s_init,
                             r_init, params, frac_ice=None, hyst=False,
                             ice=False, snow_only=False, t_tile=128,
                             num_uh1=NUM_UH1, num_uh2=NUM_UH2,
                             interpret=False):
    """Fused coupled-model ensemble simulation; returns qsim (N, T).

    Trajectory variant of :func:`snowgr4j_ensemble_mse_pallas`: the same
    VMEM-resident composition, writing the discharge series per member
    (snow/GR4J storages stay in scratch; use the XLA path for storage
    trajectories).
    """
    dtype = jnp.asarray(prec).dtype
    prec = jnp.asarray(prec, dtype)
    frac = jnp.asarray(frac_solid_prec, dtype)
    snow = prec * frac
    rain = prec - snow
    T, L = prec.shape

    psol = 365.25 * jnp.mean(snow, axis=0)
    layer_consts = 0.9 * psol if not hyst else psol

    packed, n, n_pad, R = _pack_family_params(
        params, jnp.asarray(s_init, dtype), jnp.asarray(r_init, dtype),
        jnp.asarray(snow_pack_init, dtype),
        jnp.asarray(thermal_state_init, dtype), layer_consts, frac_ice,
        dtype)

    snow_b, t_pad = _pack_layer_series(snow, t_tile, dtype)
    rain_b, _ = _pack_layer_series(rain, t_tile, dtype)
    temp_b, _ = _pack_layer_series(mean_temp, t_tile, dtype)
    etp_b, _ = _pack_flat_series(etp, t_tile, dtype)

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    layer_spec = pl.BlockSpec((L, t_tile, BLOCK_LANES),
                              lambda b, t: (0, t, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                             memory_space=pltpu.VMEM)
    kernel = _make_kernel(t_tile, T, L, num_uh1, num_uh2, hyst, ice,
                          traj=True, snow_only=snow_only)
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tt),
        in_specs=[
            layer_spec, layer_spec, layer_spec, flat_spec,
            pl.BlockSpec((R, 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile) + tile,
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks, t_pad) + tile, dtype),
        scratch_shapes=[
            pltpu.VMEM(tile, dtype),                 # s store
            pltpu.VMEM(tile, dtype),                 # r store
            pltpu.VMEM((num_uh1,) + tile, dtype),    # uh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # uh2
            pltpu.VMEM((num_uh1,) + tile, dtype),    # oh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # oh2
            pltpu.VMEM((L,) + tile, dtype),          # G
            pltpu.VMEM((L,) + tile, dtype),          # eTG
            pltpu.VMEM((L,) + tile, dtype),          # sca
            pltpu.VMEM((L,) + tile, dtype),          # swe_max
            pltpu.VMEM(tile, dtype),                 # (unused accumulator)
        ],
        interpret=interpret,
    )(snow_b, rain_b, temp_b, etp_b, packed)

    qsim = out.transpose(0, 2, 3, 1).reshape(n_pad, t_pad)
    return qsim[:n, :T]


@functools.partial(jax.jit, static_argnames=(
    "hyst", "ice", "t_tile", "num_uh1", "num_uh2", "interpret", "warm"))
def snowgr4j_simulate_pallas_state(prec, mean_temp, etp, frac_solid_prec,
                                   params, state=None, snow_pack_init=0.0,
                                   thermal_state_init=0.0, s_init=0.0,
                                   r_init=0.0, frac_ice=None, hyst=False,
                                   ice=False, t_tile=128,
                                   num_uh1=NUM_UH1, num_uh2=NUM_UH2,
                                   interpret=False, warm=None):
    """Forecast-mode fused snow+GR4J simulation.

    Returns ``(qsim (N, T), final SnowGR4JState)`` -- the Pallas
    counterpart of the warm/cold-final XLA composition kernels
    (``ops/compositions.py``): all snowpack and runoff state stays
    VMEM-resident, enters from a carried
    :class:`~rrmpg_tpu.models.states.SnowGR4JState` (``state=``, every
    leaf batched over members) and exits as one state-row block per
    member.  The series-derived constants travel with the state: a warm
    segment uses the ORIGINAL series' snow-cover threshold / annual
    solid precipitation from the bundle, never recomputing them from
    its own (shorter) forcing.

    Args:
        state: (optional) batched SnowGR4JState (``pr_history`` is
            trimmed host-side to the last ``num_uh2 - 1`` inputs); cold
            reference-convention inits otherwise.
        warm: static override of ``state is not None`` (internal).
    """
    dtype = jnp.asarray(prec).dtype
    prec = jnp.asarray(prec, dtype)
    frac = jnp.asarray(frac_solid_prec, dtype)
    snow = prec * frac
    rain = prec - snow
    T, L = prec.shape
    h = num_uh2 - 1
    if warm is None:
        warm = state is not None

    if warm:
        sg = state.snow
        layer_consts = sg.psol_annual if hyst else sg.g_thresh  # (N, L)
        if hyst:
            snow_state = (sg.g, sg.etg, sg.sca, sg.swe_max)
        else:
            zeros_nl = jnp.zeros_like(jnp.asarray(sg.g, dtype))
            snow_state = (sg.g, sg.etg, zeros_nl, zeros_nl)
        hist_full = jnp.asarray(state.gr4j.pr_history, dtype)
        hist = hist_full[:, hist_full.shape[1] - h:]
        packed, n, n_pad, R = _pack_family_params(
            params, 0.0, 0.0, jnp.asarray(snow_pack_init, dtype),
            jnp.asarray(thermal_state_init, dtype), layer_consts,
            frac_ice, dtype, s0=state.gr4j.s, r0=state.gr4j.r,
            snow_state=snow_state)
    else:
        psol = 365.25 * jnp.mean(snow, axis=0)
        layer_consts = 0.9 * psol if not hyst else psol
        packed, n, n_pad, R = _pack_family_params(
            params, jnp.asarray(s_init, dtype),
            jnp.asarray(r_init, dtype),
            jnp.asarray(snow_pack_init, dtype),
            jnp.asarray(thermal_state_init, dtype), layer_consts,
            frac_ice, dtype)
        hist = jnp.zeros((n, h), dtype)
    if h == 0:
        hist = jnp.zeros((hist.shape[0], 1), dtype)
    hist_b = _pack_member_rows(hist, n_pad, dtype)

    snow_b, t_pad = _pack_layer_series(snow, t_tile, dtype)
    rain_b, _ = _pack_layer_series(rain, t_tile, dtype)
    temp_b, _ = _pack_layer_series(mean_temp, t_tile, dtype)
    etp_b, _ = _pack_flat_series(etp, t_tile, dtype)

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    layer_spec = pl.BlockSpec((L, t_tile, BLOCK_LANES),
                              lambda b, t: (0, t, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((t_tile, BLOCK_LANES), lambda b, t: (t, 0),
                             memory_space=pltpu.VMEM)
    n_fs = 2 + h + 4 * L
    kernel = _make_state_kernel(t_tile, T, L, num_uh1, num_uh2, hyst,
                                ice, warm)
    out, fstate = pl.pallas_call(
        kernel,
        grid=(n_blocks, n_tt),
        in_specs=[
            layer_spec, layer_spec, layer_spec, flat_spec,
            pl.BlockSpec((R, 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((max(h, 1), 1) + tile, lambda b, t: (0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t_tile) + tile, lambda b, t: (b, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_fs) + tile, lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, t_pad) + tile, dtype),
            jax.ShapeDtypeStruct((n_blocks, n_fs) + tile, dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM(tile, dtype),                 # s store
            pltpu.VMEM(tile, dtype),                 # r store
            pltpu.VMEM((num_uh1,) + tile, dtype),    # uh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # uh2
            pltpu.VMEM((num_uh1,) + tile, dtype),    # oh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # oh2
            pltpu.VMEM((L,) + tile, dtype),          # G
            pltpu.VMEM((L,) + tile, dtype),          # eTG
            pltpu.VMEM((L,) + tile, dtype),          # sca
            pltpu.VMEM((L,) + tile, dtype),          # swe_max
            pltpu.VMEM((max(h, 1),) + tile, dtype),  # pr history
        ],
        interpret=interpret,
    )(snow_b, rain_b, temp_b, etp_b, packed, hist_b)

    qsim = out.transpose(0, 2, 3, 1).reshape(n_pad, t_pad)[:n, :T]
    fs = fstate.transpose(1, 0, 2, 3).reshape(n_fs, n_pad)[:, :n]
    from ..models.states import (
        CemaneigeHystState as _Hyst,
        CemaneigeState as _Plain,
        SnowGR4JState as _Snow,
    )
    from .gr4j import GR4JState
    gr4j_final = GR4JState(s=fs[0], r=fs[1], pr_history=fs[2:2 + h].T)
    G = fs[2 + h:2 + h + L].T
    eTG = fs[2 + h + L:2 + h + 2 * L].T
    consts = jnp.broadcast_to(layer_consts, (n, L))
    if hyst:
        sca = fs[2 + h + 2 * L:2 + h + 3 * L].T
        swe = fs[2 + h + 3 * L:].T
        snow_final = _Hyst(g=G, etg=eTG, sca=sca, swe_max=swe,
                           psol_annual=consts)
    else:
        snow_final = _Plain(g=G, etg=eTG, g_thresh=consts)
    return qsim, _Snow(snow=snow_final, gr4j=gr4j_final)


def _with_dummy_gr4j(params):
    """Fill inert GR4J rows so the family packer accepts snow-only params."""
    n = jnp.asarray(params['CTG']).shape[0]
    ones = jnp.ones(n, jnp.asarray(params['CTG']).dtype)
    return dict(params, x1=ones, x2=0.0 * ones, x3=ones, x4=ones)


def cemaneige_simulate_pallas(prec, mean_temp, frac_solid_prec,
                              snow_pack_init, thermal_state_init, params,
                              t_tile=128, interpret=False):
    """Fused standalone-Cemaneige ensemble simulation; returns (N, T).

    Snow-only mode of the family kernel: the catchment outflow (layer-mean
    rain + melt, ``rrmpg/models/cemaneige_model.py:121-125``) is written
    per member; the runoff-routing rows are inert.
    """
    etp = jnp.zeros(jnp.asarray(prec).shape[0],
                    jnp.asarray(prec).dtype)      # unused in snow_only
    return snowgr4j_simulate_pallas(
        prec, mean_temp, etp, frac_solid_prec, snow_pack_init,
        thermal_state_init, 0.0, 0.0, _with_dummy_gr4j(params),
        snow_only=True, t_tile=t_tile, num_uh1=1, num_uh2=1,
        interpret=interpret)


def cemaneige_ensemble_mse_pallas(prec, mean_temp, frac_solid_prec, qobs,
                                  snow_pack_init, thermal_state_init,
                                  params, t_tile=128, interpret=False,
                                  stats=False, masked=False):
    """Fused standalone-Cemaneige ensemble MSE; returns (N,) losses
    ((4, N) sufficient statistics with ``stats=True``).  ``masked``
    excludes NaN observations (missing-data gaps)."""
    etp = jnp.zeros(jnp.asarray(prec).shape[0],
                    jnp.asarray(prec).dtype)
    return snowgr4j_ensemble_mse_pallas(
        prec, mean_temp, etp, frac_solid_prec, qobs, snow_pack_init,
        thermal_state_init, 0.0, 0.0, _with_dummy_gr4j(params),
        snow_only=True, stats=stats, t_tile=t_tile, num_uh1=1, num_uh2=1,
        interpret=interpret, masked=masked)


@functools.partial(jax.jit, static_argnames=(
    "hyst", "ice", "stats", "t_tile", "num_uh1", "num_uh2", "interpret",
    "masked"))
def snowgr4j_regional_mse_pallas(prec, mean_temp, etp, frac_solid_prec,
                                 qobs, snow_pack_init, thermal_state_init,
                                 s_init, r_init, params, frac_ice=None,
                                 hyst=False, ice=False, stats=False,
                                 t_tile=128, num_uh1=NUM_UH1,
                                 num_uh2=NUM_UH2, interpret=False,
                                 masked=False):
    """Fused regional coupled-model MC objective; returns (C, N) losses.

    The (catchment x member) extension of
    :func:`snowgr4j_ensemble_mse_pallas`: a third grid dimension walks the
    catchments, each with its own layer forcing, observations, per-layer
    snow thresholds (``G_tresh`` / annual solid precipitation are
    catchment-local precomputes) and optionally per-catchment glacier
    fractions -- one float per (catchment, member) reaches HBM.

    Args:
        prec, mean_temp, frac_solid_prec: (C, T, L) layer forcing.
        etp, qobs: (C, T) series.
        params: dict of (N,) member parameter arrays, shared across
            catchments.
        frac_ice: (L,) shared or (C, L) per-catchment glacier fractions.
        stats: return (4, C, N) sufficient statistics instead of MSE.
        masked: (compile-time) exclude NaN observations, normalizing
            each catchment over its own valid count -- ragged discharge
            records (NaN-padded to rectangular) calibrate correctly.
    """
    _check_t_tile(t_tile)
    dtype = jnp.asarray(prec).dtype
    prec = jnp.asarray(prec, dtype)
    frac = jnp.asarray(frac_solid_prec, dtype)
    snow = prec * frac
    rain = prec - snow
    C, T, L = prec.shape

    psol = 365.25 * jnp.mean(snow, axis=1)            # (C, L)
    layer_consts = 0.9 * psol if not hyst else psol
    if frac_ice is not None:
        frac_ice = jnp.broadcast_to(jnp.asarray(frac_ice, dtype), (C, L))

    packs = []
    for c in range(C):
        fi_c = None if frac_ice is None else frac_ice[c]
        packed_c, n, n_pad, R = _pack_family_params(
            params, jnp.asarray(s_init, dtype), jnp.asarray(r_init, dtype),
            jnp.asarray(snow_pack_init, dtype),
            jnp.asarray(thermal_state_init, dtype), layer_consts[c], fi_c,
            dtype)
        packs.append(packed_c)
    packed = jnp.stack(packs)                          # (C, R, nB, 8, 128)

    def pack_layers(series):                           # (C, T, L) ->
        stacked = [_pack_layer_series(series[c], t_tile, dtype)[0]
                   for c in range(C)]
        return jnp.stack(stacked)                      # (C, L, T_pad, 128)

    snow_b = pack_layers(snow)
    rain_b = pack_layers(rain)
    temp_b = pack_layers(mean_temp)
    etp_b = jnp.stack([_pack_flat_series(etp[c], t_tile, dtype)[0]
                       for c in range(C)])
    qobs_b = jnp.stack([_pack_flat_series(qobs[c], t_tile, dtype)[0]
                        for c in range(C)])
    t_pad = snow_b.shape[2]

    n_blocks = n_pad // BLOCK
    n_tt = t_pad // t_tile
    tile = (BLOCK_SUBLANES, BLOCK_LANES)
    n_acc = 4 if stats else 1

    layer_spec = pl.BlockSpec((1, L, t_tile, BLOCK_LANES),
                              lambda c, b, t: (c, 0, t, 0),
                              memory_space=pltpu.VMEM)
    flat_spec = pl.BlockSpec((1, t_tile, BLOCK_LANES),
                             lambda c, b, t: (c, t, 0),
                             memory_space=pltpu.VMEM)

    inner = _make_kernel(t_tile, T, L, num_uh1, num_uh2, hyst, ice,
                         stats=stats, t_axis=2, masked=masked)

    def kernel(snow_ref, rain_ref, temp_ref, etp_ref, qobs_ref,
               params_ref, out_ref, *scratch):
        inner(snow_ref.at[0], rain_ref.at[0], temp_ref.at[0],
              etp_ref.at[0], qobs_ref.at[0], params_ref.at[0],
              out_ref.at[0], *scratch)

    out = pl.pallas_call(
        kernel,
        grid=(C, n_blocks, n_tt),
        in_specs=[
            layer_spec, layer_spec, layer_spec, flat_spec, flat_spec,
            pl.BlockSpec((1, R, 1) + tile, lambda c, b, t: (c, 0, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n_acc) + tile, lambda c, b, t: (c, b, 0, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (C, n_blocks, n_acc) + tile, dtype),
        scratch_shapes=[
            pltpu.VMEM(tile, dtype),                 # s store
            pltpu.VMEM(tile, dtype),                 # r store
            pltpu.VMEM((num_uh1,) + tile, dtype),    # uh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # uh2
            pltpu.VMEM((num_uh1,) + tile, dtype),    # oh1
            pltpu.VMEM((num_uh2,) + tile, dtype),    # oh2
            pltpu.VMEM((L,) + tile, dtype),          # G
            pltpu.VMEM((L,) + tile, dtype),          # eTG
            pltpu.VMEM((L,) + tile, dtype),          # sca
            pltpu.VMEM((L,) + tile, dtype),          # swe_max
            pltpu.VMEM((n_acc,) + tile, dtype),      # accumulators
        ],
        interpret=interpret,
    )(snow_b, rain_b, temp_b, etp_b, qobs_b, packed)

    out = out.transpose(0, 2, 1, 3, 4).reshape(C, n_acc, n_pad)[:, :, :n]
    if masked:
        # Renormalize each catchment over its own valid-step count.
        n_valid = jnp.sum(jnp.isfinite(jnp.asarray(qobs)), axis=1)
        out = out * (T / n_valid)[:, None, None]
    if stats:
        return out.transpose(1, 0, 2)                 # (4, C, N)
    return out[:, 0]                                  # (C, N)
