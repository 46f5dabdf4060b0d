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


# Physical domain of every field, enforced by :func:`repair_state`:
# ``(low, high)`` clip bounds (None = unbounded on that side).  The
# hysteresis coupling ``swe_max >= g`` is handled separately.
_FIELD_DOMAINS = {
    ABCState: {"storage": (0.0, None)},
    HBVEduState: {"snow": (0.0, None), "soil": (0.0, None),
                  "s1": (0.0, None), "s2": (0.0, None)},
    CemaneigeState: {"g": (0.0, None), "etg": (None, 0.0),
                     "g_thresh": (0.0, None)},
    CemaneigeHystState: {"g": (0.0, None), "etg": (None, 0.0),
                         "sca": (0.0, 1.0), "swe_max": (0.0, None),
                         "psol_annual": (0.0, None)},
    GR4JState: {"s": (0.0, None), "r": (0.0, None),
                "pr_history": (0.0, None)},
}


def repair_state(state):
    """Clip a state bundle back into its physical domain (idempotent).

    Simulation kernels assume their carried states are physical: stores
    and filter histories non-negative, the Cemaneige thermal state
    ``etg <= 0`` (``ops/cemaneige.py:43`` clips it every step), the
    snow-cover fraction ``sca`` in ``[0, 1]``, and the hysteresis
    invariant ``swe_max >= g``.  States produced by an EnKF/particle
    filter analysis, a hand-edited checkpoint, or user code can violate
    these -- e.g. a negative GR4J routing store feeds
    ``x2 * (r / x3)**3.5`` (``ops/gr4j.py``) a negative base and the
    whole continuation turns NaN.  This repairs a bundle by clipping
    every field into its domain and restoring ``swe_max >= g``.

    On an already-physical state this is a bit-exact identity, so it is
    safe to apply unconditionally at warm-continuation entry.

    Accepts any known bundle type (:data:`_FIELD_DOMAINS` keys),
    :class:`SnowGR4JState` (repaired recursively), or ``None``
    (returned unchanged).
    """
    if state is None:
        return None
    cls = type(state)
    if cls is SnowGR4JState:
        return SnowGR4JState(snow=repair_state(state.snow),
                             gr4j=repair_state(state.gr4j))
    try:
        domains = _FIELD_DOMAINS[cls]
    except KeyError:
        raise TypeError(
            f"repair_state knows no physical domain for "
            f"{cls.__name__}; known bundles: "
            f"{sorted(c.__name__ for c in _FIELD_DOMAINS)} and "
            "SnowGR4JState.") from None
    repaired = {}
    for fld in cls._fields:
        low, high = domains[fld]
        leaf = jnp.asarray(getattr(state, fld))
        if low is not None:
            leaf = jnp.maximum(leaf, jnp.asarray(low, leaf.dtype))
        if high is not None:
            leaf = jnp.minimum(leaf, jnp.asarray(high, leaf.dtype))
        repaired[fld] = leaf
    if cls is CemaneigeHystState:
        # Hysteresis coupling: the running SWE maximum can never sit
        # below the current snowpack.
        repaired["swe_max"] = jnp.maximum(repaired["swe_max"],
                                          repaired["g"])
    return cls(**repaired)


def is_repairable(state):
    """True if :func:`repair_state` knows this bundle's domain."""
    cls = type(state)
    if cls is SnowGR4JState:
        return is_repairable(state.snow) and is_repairable(state.gr4j)
    return cls in _FIELD_DOMAINS


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

    The result is also passed through :func:`repair_state`: warm kernels
    assume physical carries, so an out-of-domain input (e.g. a raw
    filter-analysis state with a negative store) enters as clipped
    physics rather than propagating silent NaN.  Physical inputs pass
    through bit-exactly.
    """
    return repair_state(_normalize_shape(state, num, dtype))


def _normalize_shape(state, num, dtype):
    cls = type(state)
    if cls is SnowGR4JState:
        return SnowGR4JState(
            snow=_normalize_shape(state.snow, num, dtype),
            gr4j=_normalize_shape(state.gr4j, num, dtype))
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
    The result is repaired into its physical domain (see
    :func:`repair_state`); physical inputs pass through bit-exactly.
    """
    return repair_state(_single_member_shape(state, dtype))


def _single_member_shape(state, dtype):
    cls = type(state)
    if cls is SnowGR4JState:
        return SnowGR4JState(
            snow=_single_member_shape(state.snow, dtype),
            gr4j=_single_member_shape(state.gr4j, dtype))
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
