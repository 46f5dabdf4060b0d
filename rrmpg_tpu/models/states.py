"""Class-level simulation state bundles (forecast / operational mode).

``model.simulate(..., return_final_state=True)`` returns one of these
bundles; passing it back as ``initial_state=`` continues the simulation
where the previous call stopped -- the operational capability the
reference cannot express (its ``*_init`` scalars cover only store levels,
not the GR4J unit-hydrograph filter history or the Cemaneige
data-dependent snow-cover constants, see
``rrmpg/models/gr4j.py:136-144`` / ``cemaneige_model.py:80``).

Each bundle packs the ops-level carry *plus* the series-derived constants
its warm kernel needs, so a state is self-contained: nothing about the
original series has to be remembered separately.

Batching convention: every leaf carries a leading ensemble axis ``N``
matching the parameter batch of the call that produced it (``N = 1`` for
an instance-parameter simulation).  ``initial_state`` inputs may instead
carry unbatched leaves (one shared state for all members); they are
broadcast.
"""

import typing

import jax.numpy as jnp

from ..ops.gr4j import GR4JState


class ABCState(typing.NamedTuple):
    """ABC model state: the single storage."""
    storage: jnp.ndarray  # (N,)


class HBVEduState(typing.NamedTuple):
    """HBV-Edu state: the four storages."""
    snow: jnp.ndarray  # (N,)
    soil: jnp.ndarray  # (N,)
    s1: jnp.ndarray    # (N,)
    s2: jnp.ndarray    # (N,)


class CemaneigeState(typing.NamedTuple):
    """Cemaneige state: per-layer snowpack/thermal state + the snow-cover
    threshold of the *original* series (a data-dependent precompute that a
    continuation segment must not recompute from its own, shorter
    forcing)."""
    g: jnp.ndarray         # (N, L) snowpack SWE
    etg: jnp.ndarray       # (N, L) snowpack thermal state
    g_thresh: jnp.ndarray  # (N, L) snow-cover threshold, original series


class CemaneigeHystState(typing.NamedTuple):
    """Hysteresis-Cemaneige state: adds the SCA hysteresis carry and the
    original series' mean annual solid precipitation (the melt-threshold
    precompute)."""
    g: jnp.ndarray            # (N, L)
    etg: jnp.ndarray          # (N, L)
    sca: jnp.ndarray          # (N, L) snow-covered area fraction
    swe_max: jnp.ndarray      # (N, L) running SWE maximum
    psol_annual: jnp.ndarray  # (N, L) annual solid precip, original series


class SnowGR4JState(typing.NamedTuple):
    """Combined state of the snow + GR4J composition classes."""
    snow: typing.Union[CemaneigeState, CemaneigeHystState]
    gr4j: GR4JState


# Unbatched ("core") ndim of every field, for input normalization.
_CORE_NDIMS = {
    ABCState: (0,),
    HBVEduState: (0, 0, 0, 0),
    CemaneigeState: (1, 1, 1),
    CemaneigeHystState: (1, 1, 1, 1, 1),
    GR4JState: (0, 0, 1),
}


def _normalize_leaf(leaf, core_ndim, num, name, dtype):
    arr = jnp.asarray(leaf, dtype=dtype)
    if arr.ndim == core_ndim:
        return jnp.broadcast_to(arr, (num,) + arr.shape)
    if arr.ndim == core_ndim + 1:
        if arr.shape[0] == num:
            return arr
        if arr.shape[0] == 1:
            return jnp.broadcast_to(arr, (num,) + arr.shape[1:])
        raise ValueError(
            f"initial_state.{name} is batched over {arr.shape[0]} members "
            f"but {num} parameter set(s) are being simulated; the leading "
            "state axis must match the parameter batch (or be absent / 1 "
            "to share one state).")
    raise ValueError(
        f"initial_state.{name} has ndim {arr.ndim}; expected {core_ndim} "
        f"(one shared state) or {core_ndim + 1} (leading ensemble axis).")


def normalize_state(state, num, dtype):
    """Broadcast/validate a state bundle to leading ensemble axis ``num``.

    Accepts bundles whose leaves are unbatched (shared across members),
    batched over 1, or batched over exactly ``num``; anything else raises.
    Nested bundles (:class:`SnowGR4JState`) are handled recursively.
    """
    cls = type(state)
    if cls is SnowGR4JState:
        return SnowGR4JState(
            snow=normalize_state(state.snow, num, dtype),
            gr4j=normalize_state(state.gr4j, num, dtype))
    core = _CORE_NDIMS[cls]
    fields = cls._fields
    return cls(*(_normalize_leaf(leaf, nd, num, f"{cls.__name__}.{fld}",
                                 dtype)
                 for leaf, nd, fld in zip(state, core, fields)))


def single_member_state(state, dtype):
    """Collapse a state bundle to unbatched leaves.

    Calibration from a carried state (``fit(initial_state=)``) needs ONE
    initial condition shared by every candidate parameter vector; accepts
    unbatched leaves or a leading ensemble axis of exactly 1 (squeezed).
    """
    cls = type(state)
    if cls is SnowGR4JState:
        return SnowGR4JState(
            snow=single_member_state(state.snow, dtype),
            gr4j=single_member_state(state.gr4j, dtype))
    core = _CORE_NDIMS[cls]

    def collapse(leaf, core_ndim, name):
        arr = jnp.asarray(leaf, dtype=dtype)
        if arr.ndim == core_ndim:
            return arr
        if arr.ndim == core_ndim + 1 and arr.shape[0] == 1:
            return arr[0]
        raise ValueError(
            f"Calibration from a state needs one initial condition, but "
            f"initial_state.{name} has shape {arr.shape}; pass the state "
            "of a single member (e.g. index the bundle with "
            "jax.tree.map(lambda x: x[i], state)).")

    return cls(*(collapse(leaf, nd, f"{cls.__name__}.{fld}")
                 for leaf, nd, fld in zip(state, core, cls._fields)))


def check_state_type(state, expected, model_name, snow_cls=None):
    """Raise a helpful TypeError for a wrong ``initial_state`` input."""
    if not isinstance(state, expected):
        raise TypeError(
            f"'initial_state' for {model_name} must be a "
            f"{expected.__name__} (as returned by simulate(..., "
            f"return_final_state=True)); got {type(state).__name__}.")
    if snow_cls is not None and not isinstance(state.snow, snow_cls):
        raise TypeError(
            f"'initial_state.snow' for {model_name} must be a "
            f"{snow_cls.__name__}; got {type(state.snow).__name__}.")
