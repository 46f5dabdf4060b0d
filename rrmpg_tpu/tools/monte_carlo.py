"""Monte-Carlo ensemble simulation.

API-compatible with the reference ``monte_carlo``
(``rrmpg/tools/monte_carlo.py:19-76``), but the ensemble is evaluated as a
single batched device program (the reference loops serially over parameter
sets inside ``model.simulate`` and then computes per-member MSE in a Python
loop; here the MSE reduction is one batched jnp call as well).

For ensembles that exceed a single chip, pass a ``mesh`` -- the parameter
axis is sharded with GSPMD and each chip simulates its shard (see
:mod:`rrmpg_tpu.parallel.ensemble`).
"""

import numpy as np

from ..models.basemodel import BaseModel
from ..utils.array_checks import validate_array_input


def monte_carlo(model, num, qobs=None, mesh=None, **kwargs):
    """Perform a Monte-Carlo simulation with ``num`` random parameter sets.

    Args:
        model: Any instance of a hydrological model of this package.
        num: Number of simulations.
        qobs: (optional) Array of observed streamflow; if given, the MSE of
            each simulation is returned under the ``'mse'`` key.
        mesh: (optional) ``jax.sharding.Mesh`` to shard the ensemble over.
        **kwargs: Inputs passed through to ``model.simulate``.

    Returns:
        Dict with keys ``'params'`` (structured array of sampled parameter
        sets), ``'qsim'`` ((T, num) simulated discharge) and, if ``qobs``
        was passed, ``'mse'`` ((num,) errors).

    Raises:
        ValueError: If any input contains invalid values.
        TypeError: If any of the inputs has a wrong datatype.
    """
    if not issubclass(model.__class__, BaseModel):
        msg = ["The model must be one of the models implemented in the ",
               "rrmpg.models module."]
        raise TypeError("".join(msg))

    if not isinstance(num, int) or num < 1:
        raise TypeError("'n' must be a positive integer greate than zero.")

    if qobs is not None:
        qobs = validate_array_input(qobs, np.float64, 'qobs')

    params = model.get_random_params(num=num)

    if mesh is not None:
        kwargs = dict(kwargs, mesh=mesh)
    qsim = model.simulate(params=params, **kwargs)

    if qobs is not None:
        # One batched reduction over the ensemble axis.
        mse_values = np.mean((qsim - qobs[:, None]) ** 2, axis=0)
        return {'params': params, 'qsim': qsim, 'mse': mse_values}
    return {'params': params, 'qsim': qsim}
