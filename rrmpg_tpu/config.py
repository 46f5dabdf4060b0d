"""Global configuration helpers for rrmpg-tpu.

The reference implementation computes everything in float64
(``rrmpg/models/basemodel.py:28-35`` declares float64 structured dtypes).
On TPU, float64 is emulated and slow; the idiomatic choice is float32 (or
bfloat16 for purely throughput-bound sweeps).  rrmpg-tpu therefore computes
in JAX's default dtype: float32 unless ``jax_enable_x64`` is switched on.

Validation against the reference's golden data (Excel/MATLAB trajectories)
is done on CPU with x64 enabled -- see ``tests/conftest.py``.
"""

import jax
import jax.numpy as jnp


def enable_x64(enable: bool = True) -> None:
    """Enable (or disable) float64 computation globally.

    Use this for bit-parity validation against the float64 reference
    implementation.  Keep it off for TPU production runs.
    """
    jax.config.update("jax_enable_x64", enable)


def default_float():
    """The current default floating dtype (float64 iff x64 is enabled)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
