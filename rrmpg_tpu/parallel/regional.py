"""Regional (multi-catchment) execution.

The reference simulates one catchment per call; regional studies loop in
user code.  Here the catchment axis is a first-class batch dimension:
``regional_run`` vmaps a single-catchment kernel over stacked forcings,
optionally crossed with a parameter-ensemble axis, and shards either axis
over a 2-D (ensemble, catchment) device mesh.

Axis layout of the result: ``(C, ...)`` for shared parameters,
``(C, N, ...)`` when an ensemble dict of (N,) parameter arrays is passed.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import CATCHMENT_AXIS, ENSEMBLE_AXIS


@functools.lru_cache(maxsize=None)
def _regional_fn(kernel, n_forcing, ensemble):
    per_catchment = jax.vmap(kernel,
                             in_axes=(0,) * n_forcing + (None,))
    if ensemble:
        # params mapped over axis 0, forcings shared within the inner vmap.
        fn = jax.vmap(per_catchment,
                      in_axes=(None,) * n_forcing + (0,),
                      out_axes=1)
    else:
        fn = per_catchment
    return jax.jit(fn)


def regional_run(kernel, forcings, params, mesh=None):
    """Run a single-catchment kernel over a batch of catchments.

    Args:
        kernel: pure function ``kernel(*forcings_one_catchment, params)``.
        forcings: tuple of arrays with a leading catchment axis (C, ...).
        params: dict of scalars (shared parameters) or of (N,) arrays
            (parameter ensemble crossed with every catchment).
        mesh: optional device mesh; the catchment axis (and the ensemble
            axis, if present) are sharded over the matching mesh axes.

    Returns:
        Tuple of outputs with leading axis C (shared params) or axes
        (C, N) (ensemble).
    """
    forcings = tuple(jnp.asarray(f) for f in forcings)
    leaf = jax.tree.leaves(params)[0]
    ensemble = jnp.ndim(leaf) > 0

    if mesh is not None:
        cat = NamedSharding(mesh, P(CATCHMENT_AXIS))
        forcings = tuple(jax.device_put(f, cat) for f in forcings)
        if ensemble and ENSEMBLE_AXIS in mesh.shape:
            ens = NamedSharding(mesh, P(ENSEMBLE_AXIS))
            params = jax.tree.map(lambda x: jax.device_put(x, ens), params)

    fn = _regional_fn(kernel, len(forcings), ensemble)
    outputs = fn(*forcings, params)
    if not isinstance(outputs, tuple):
        outputs = (outputs,)
    return outputs
