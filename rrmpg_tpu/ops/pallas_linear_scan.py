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
