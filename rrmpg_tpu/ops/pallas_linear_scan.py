"""Fused Pallas linear-recurrence kernel (single long series).

Solves ``S[t] = alpha * S[t-1] + B[t]`` plus the ABC-model output
``qsim[t] = coeff * P[t] + c * S[t-1]`` in ONE pass over the series:
the grid iterates sequential chunks of ``R x 128`` elements; within a
chunk the weighted prefix evaluates as two MXU matmuls against
host-precomputed Toeplitz power matrices (the same decomposition as
``ops/linear_scan.py``, but fused so the forcing is read once and the two
outputs are written once -- no intermediate HBM traffic, which limits the
pure-XLA formulation).

Used by the headline ABC benchmark: the reference's numba kernel does 10M
timesteps in 33.3 ms on a CPU core; this kernel targets the HBM-bandwidth
bound (~120 MB moved for a 10M-step f32 simulation).
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _kernel(R, prec_ref, mt_ref, m2e_ref, powvec_ref, powlane_ref,
            scal_ref, qsim_ref, storage_ref, carry_ref):
    blk = pl.program_id(0)
    coeff_q = scal_ref[0, 0]   # 1 - a - b
    c = scal_ref[0, 1]
    s0 = scal_ref[0, 2]
    a = scal_ref[0, 3]

    p = prec_ref[...]                       # (R, 128)
    row = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    col = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)

    # Input series of the recurrence; element t=0 is overridden so that
    # S[0] == s0 exactly (S[-1] := 0, B[0] := s0).
    b = a * p
    first = (blk == 0) & (row == 0) & (col == 0)
    b = jnp.where(first, s0, b)

    @pl.when(blk == 0)
    def _():
        carry_ref[0, 0] = jnp.zeros((), dtype=b.dtype)

    s_in = carry_ref[0, 0]

    # Within-row weighted prefix: one MXU matmul against the upper-
    # triangular power matrix M^T[k, j] = alpha^(j-k), k <= j.
    within = jnp.dot(b, mt_ref[...], preferred_element_type=b.dtype,
                     precision=lax.Precision.HIGHEST)

    # Cross-row carries: strict-lower Toeplitz of alpha^128 powers applied
    # to the row totals.  The (R, R) @ (R, 1) product is narrow (1/128 MXU
    # efficiency), so R is kept small (128) and the grid supplies
    # parallel-in-flight blocks.
    e = within[:, LANES - 1:LANES]          # (R, 1)
    excl = jnp.dot(m2e_ref[...], e, preferred_element_type=b.dtype,
                   precision=lax.Precision.HIGHEST)
    s_row_start = excl + powvec_ref[...] * s_in   # (R, 1)

    S = within + s_row_start * powlane_ref[...]   # (R, 128)

    # S_prev[i, j] = S[i, j-1]; the first column is the row-start state.
    s_shift = pltpu.roll(S, 1, 1)
    s_prev = jnp.where(col == 0, s_row_start, s_shift)

    qsim = coeff_q * p + c * s_prev
    qsim = jnp.where(first, 0.0, qsim)

    qsim_ref[...] = qsim
    storage_ref[...] = S
    carry_ref[0, 0] = S[R - 1, LANES - 1]


@functools.partial(jax.jit, static_argnames=("rows", "interpret"))
def abc_fused_pallas(prec, initial_state, params, rows: int = 128,
                     interpret: bool = False):
    """ABC-model simulation as one fused Pallas pass; returns (qsim, S).

    Args:
        prec: (T,) precipitation series.
        initial_state: scalar initial storage.
        params: dict with scalar 'a', 'b', 'c'.
        rows: sublane rows per chunk (chunk = rows * 128 timesteps).
    """
    if rows % LANES != 0:
        raise ValueError("rows must be a multiple of 128")
    prec = jnp.asarray(prec)
    dtype = prec.dtype
    a = jnp.asarray(params['a'], dtype)
    b_par = jnp.asarray(params['b'], dtype)
    c = jnp.asarray(params['c'], dtype)
    alpha = 1.0 - c
    s0 = jnp.asarray(initial_state, dtype)

    T = prec.shape[0]
    chunk = rows * LANES
    n_blocks = -(-T // chunk)
    t_pad = n_blocks * chunk
    prec_b = jnp.pad(prec, (0, t_pad - T)).reshape(n_blocks * rows, LANES)

    # Host-precomputed power matrices (tiny relative to the series).
    j = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    k = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    mt = jnp.where(k <= j, alpha ** jnp.clip(j - k, 0, None).astype(dtype),
                   jnp.zeros((), dtype))
    alpha_row = alpha ** jnp.asarray(LANES, dtype)
    i2 = lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    k2 = lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    m2e = jnp.where(
        k2 < i2,
        alpha_row ** jnp.clip(i2 - 1 - k2, 0, None).astype(dtype),
        jnp.zeros((), dtype))
    powvec = (alpha_row ** jnp.arange(rows, dtype=dtype))[:, None]
    powlane = (alpha ** jnp.arange(1, LANES + 1, dtype=dtype))[None, :]
    scal = jnp.stack([1.0 - a - b_par, c, s0, a]).reshape(1, 4)

    block = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    qsim, storage = pl.pallas_call(
        functools.partial(_kernel, rows),
        grid=(n_blocks,),
        in_specs=[
            block,
            full((LANES, LANES)),
            full((rows, rows)),
            full((rows, 1)),
            full((1, LANES)),
            pl.BlockSpec((1, 4), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=(block, block),
        out_shape=(
            jax.ShapeDtypeStruct((n_blocks * rows, LANES), dtype),
            jax.ShapeDtypeStruct((n_blocks * rows, LANES), dtype),
        ),
        scratch_shapes=[pltpu.SMEM((1, 1), dtype)],
        interpret=interpret,
    )(prec_b, mt, m2e, powvec, powlane, scal)

    return qsim.reshape(t_pad)[:T], storage.reshape(t_pad)[:T]


# ---------------------------------------------------------------------------
# Single-program variant: the whole 10M-step series in ONE Pallas program
# with in-kernel DMA double buffering (no grid, so no per-grid-step
# dispatch cost).  The inter-chunk dependency is a single scalar FMA, so
# DMA-in of chunk i+1, compute of chunk i and DMA-out of chunk i-1 all
# overlap; throughput is bounded by HBM bandwidth (~120 MB moved for a
# 10M-step f32 run), not by dispatch.
#
# The cross-row carry inside a chunk deliberately avoids the naive
# (R, R) @ (R, 1) matmul (1 useful MXU lane out of 128 -- it dominated the
# first version of this kernel).  Instead the R row-end totals are
# produced directly along *lanes* with a transposed contraction
# (wrow x b^T on the MXU), scanned in a compact (R/128, 128) layout with a
# 128-wide Toeplitz matmul, and the per-row start states are moved back to
# the sublane axis with identity-matmul transposes -- every MXU op stays
# 128 lanes wide.
# ---------------------------------------------------------------------------

def _single_kernel(R, n_full, r_tail, precision, prec_hbm, mt_ref,
                   wrow_ref, mtg_ref, m2g_ref, powg_ref, powl_row_ref,
                   powlane_ref, eye_ref, scal_ref, qsim_hbm, storage_hbm,
                   in_buf, q_buf, s_buf, in_sem, out_sem):
    G = R // LANES
    coeff_q = scal_ref[0, 0]   # 1 - a - b
    c = scal_ref[0, 1]
    s0 = scal_ref[0, 2]
    a = scal_ref[0, 3]
    dtype = in_buf.dtype
    t_dims = (((1,), (1,)), ((), ()))   # contract lanes with lanes (A @ B^T)

    row = lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    col = lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
    gcol = lax.broadcasted_iota(jnp.int32, (G, LANES), 1)

    def in_dma(slot, idx, nrows=R):
        return pltpu.make_async_copy(
            prec_hbm.at[pl.ds(idx * R, nrows), :],
            in_buf.at[slot, pl.ds(0, nrows), :],
            in_sem.at[slot])

    def out_dmas(slot, idx, nrows=R):
        return (
            pltpu.make_async_copy(
                q_buf.at[slot, pl.ds(0, nrows), :],
                qsim_hbm.at[pl.ds(idx * R, nrows), :],
                out_sem.at[slot, 0]),
            pltpu.make_async_copy(
                s_buf.at[slot, pl.ds(0, nrows), :],
                storage_hbm.at[pl.ds(idx * R, nrows), :],
                out_sem.at[slot, 1]),
        )

    def compute(p, i, s_in, valid_rows=R):
        """One chunk of prefix math; i is the chunk index (for the t=0
        override).  A tail chunk (valid_rows < R) zeroes its un-DMA'd
        trailing rows first: the prefix matmuls multiply them by zero
        weights, and NaN-initialized scratch would otherwise poison the
        valid rows through NaN * 0."""
        b = a * p
        first = (i == 0) & (row == 0) & (col == 0)
        b = jnp.where(first, s0, b)
        if valid_rows < R:
            b = jnp.where(row < valid_rows, b, jnp.zeros((), dtype))

        # Within-row weighted prefix on the MXU.
        within = jnp.dot(b, mt_ref[...], preferred_element_type=dtype,
                         precision=precision)

        # Row-end totals produced directly along lanes: for each group of
        # 128 rows, e[g, l] = sum_j wrow[j] * b[g*128+l, j] via wrow x b^T
        # (the MXU handles the transposed operand natively).
        e_rows = [
            lax.dot_general(
                wrow_ref[...], b[g * LANES:(g + 1) * LANES, :], t_dims,
                preferred_element_type=dtype, precision=precision)
            for g in range(G)
        ]
        e8 = jnp.concatenate(e_rows, axis=0)            # (G, 128)

        # Inclusive prefix of the row-ends along lanes (factor alpha^128).
        incl = jnp.dot(e8, mtg_ref[...], preferred_element_type=dtype,
                       precision=precision)             # (G, 128)
        # Cross-group exclusive carries (G x G is tiny).
        rowtot = incl[:, LANES - 1:LANES]               # (G, 1)
        C = jnp.dot(m2g_ref[...], rowtot, preferred_element_type=dtype,
                    precision=precision) + powg_ref[...] * s_in
        # Inclusive state at the end of each row; exclusive = shifted.
        P = incl + C * powl_row_ref[...]                # (G, 128)
        start8 = jnp.where(gcol == 0, C, pltpu.roll(P, 1, 1))

        # Back to the sublane axis with identity matmuls, one per group so
        # every (128, 1) result sits at lane offset 0 (Mosaic cannot
        # concatenate slices with mismatched lane offsets).
        start_cols = [
            lax.dot_general(eye_ref[...], start8[g:g + 1, :], t_dims,
                            preferred_element_type=dtype,
                            precision=precision)        # (128, 1)
            for g in range(G)
        ]
        s_row_start = jnp.concatenate(start_cols, axis=0)  # (R, 1)

        S = within + s_row_start * powlane_ref[...]

        s_shift = pltpu.roll(S, 1, 1)
        s_prev = jnp.where(col == 0, s_row_start, s_shift)
        qsim = coeff_q * p + c * s_prev
        qsim = jnp.where(first, jnp.zeros((), dtype), qsim)
        return qsim, S, P[G - 1, LANES - 1]

    if n_full > 0:
        in_dma(0, 0).start()
    else:
        in_dma(0, 0, r_tail).start()

    def step(i, s_in):
        slot = i % 2

        @pl.when(i + 1 < n_full)
        def _():
            in_dma((i + 1) % 2, i + 1).start()

        if r_tail:
            @pl.when(i + 1 == n_full)
            def _():
                in_dma((i + 1) % 2, n_full, r_tail).start()

        in_dma(slot, i).wait()
        qsim, S, carry = compute(in_buf[slot], i, s_in)

        # The output buffers for this slot were last used by iteration
        # i - 2; drain those copies before overwriting.
        @pl.when(i >= 2)
        def _():
            qd, sd = out_dmas(slot, i - 2)
            qd.wait()
            sd.wait()

        q_buf[slot] = qsim
        s_buf[slot] = S
        qd, sd = out_dmas(slot, i)
        qd.start()
        sd.start()

        return carry

    if n_full > 0:
        s_in = lax.fori_loop(0, n_full, step, jnp.zeros((), dtype))
    else:
        s_in = jnp.zeros((), dtype)

    if r_tail:
        # Tail chunk (r_tail < R rows): same compute, partial DMAs; its
        # carry is unused, and garbage in the trailing buffer rows cannot
        # leak (row-local math, partial write-back).
        i = n_full
        slot = i % 2
        in_dma(slot, i, r_tail).wait()
        qsim, S, _ = compute(in_buf[slot], i, s_in, valid_rows=r_tail)
        if i >= 2:
            qd, sd = out_dmas(slot, i - 2)
            qd.wait()
            sd.wait()
        q_buf[slot] = qsim
        s_buf[slot] = S
        qd, sd = out_dmas(slot, i, r_tail)
        qd.start()
        sd.start()
        qd.wait()
        sd.wait()
        drain = range(max(0, n_full - 1), n_full)
    else:
        drain = range(max(0, n_full - 2), n_full)

    # Drain the remaining in-flight full-chunk output copies.
    for idx in drain:
        qd, sd = out_dmas(idx % 2, idx)
        qd.wait()
        sd.wait()


@functools.partial(jax.jit, static_argnames=("rows", "interpret",
                                              "precision"))
def abc_fused_single_pallas(prec, initial_state, params, rows: int = 1024,
                            interpret: bool = False,
                            precision=lax.Precision.HIGHEST):
    """ABC-model simulation as ONE Pallas program; returns (qsim, S).

    Functionally identical to :func:`abc_fused_pallas` but the time chunks
    are driven by an in-kernel ``fori_loop`` with manual double-buffered
    HBM<->VMEM DMA instead of a sequential Pallas grid, eliminating the
    per-grid-step dispatch overhead that dominates the grid variant on
    long series.

    Args:
        prec: (T,) precipitation series.
        initial_state: scalar initial storage.
        params: dict with scalar 'a', 'b', 'c'.
        rows: sublane rows per chunk (chunk = rows * 128 timesteps;
            must be a multiple of 128).
        precision: MXU precision for the prefix matmuls.
    """
    if rows % LANES != 0:
        raise ValueError("rows must be a multiple of 128")
    G = rows // LANES
    prec = jnp.asarray(prec)
    dtype = prec.dtype
    a = jnp.asarray(params['a'], dtype)
    b_par = jnp.asarray(params['b'], dtype)
    c = jnp.asarray(params['c'], dtype)
    alpha = 1.0 - c
    s0 = jnp.asarray(initial_state, dtype)

    T = prec.shape[0]
    # Lane-blocking: when T is a multiple of 128 the (n_rows, 128)
    # reshape is free (row-major) and no padded copy of the series is
    # needed -- the kernel handles a partial tail chunk natively.  The
    # pad path remains for ragged T.
    n_rows = -(-T // LANES)
    if n_rows * LANES == T:
        prec_b = prec.reshape(n_rows, LANES)
    else:
        prec_b = jnp.pad(prec, (0, n_rows * LANES - T)).reshape(n_rows,
                                                                LANES)
    n_full, r_tail = divmod(n_rows, rows)
    t_pad = n_rows * LANES

    j = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    k = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    jk = jnp.clip(j - k, 0, None).astype(dtype)
    mt = jnp.where(k <= j, alpha ** jk, jnp.zeros((), dtype))
    alpha_row = alpha ** jnp.asarray(LANES, dtype)
    mtg = jnp.where(k <= j, alpha_row ** jk, jnp.zeros((), dtype))
    wrow = (alpha ** jnp.arange(LANES - 1, -1, -1, dtype=dtype))[None, :]
    alpha_g = alpha_row ** jnp.asarray(LANES, dtype)  # alpha^(128*128)
    ig = lax.broadcasted_iota(jnp.int32, (G, G), 0)
    kg = lax.broadcasted_iota(jnp.int32, (G, G), 1)
    m2g = jnp.where(
        kg < ig, alpha_g ** jnp.clip(ig - 1 - kg, 0, None).astype(dtype),
        jnp.zeros((), dtype))
    powg = (alpha_g ** jnp.arange(G, dtype=dtype))[:, None]
    powl_row = (alpha_row ** jnp.arange(1, LANES + 1, dtype=dtype))[None, :]
    powlane = (alpha ** jnp.arange(1, LANES + 1, dtype=dtype))[None, :]
    eye = jnp.eye(LANES, dtype=dtype)
    scal = jnp.stack([1.0 - a - b_par, c, s0, a]).reshape(1, 4)

    vmem_full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    qsim, storage = pl.pallas_call(
        functools.partial(_single_kernel, rows, n_full, r_tail,
                          precision),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            vmem_full(), vmem_full(), vmem_full(), vmem_full(),
            vmem_full(), vmem_full(), vmem_full(), vmem_full(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=(
            jax.ShapeDtypeStruct((n_rows, LANES), dtype),
            jax.ShapeDtypeStruct((n_rows, LANES), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, rows, LANES), dtype),
            pltpu.VMEM((2, rows, LANES), dtype),
            pltpu.VMEM((2, rows, LANES), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(prec_b, mt, wrow, mtg, m2g, powg, powl_row, powlane, eye, scal)

    return qsim.reshape(t_pad)[:T], storage.reshape(t_pad)[:T]
