"""Plotting helpers for ensemble simulations.

Functional equivalent of the reference ``plot_qsim_range``
(``rrmpg/utils/plot_utils.py:22-91``): plots the (5, 95) and (25, 75)
percentile bands over an ensemble of simulations plus the ensemble mean
and optionally the observations.  For very large sharded ensembles,
reduce to the four (T,) percentile bands on device first
(``jnp.percentile`` over the member axis) and pass the result here.
"""

import numpy as np


def plot_qsim_range(qsim, x_vals=None, qobs=None):
    """Plot the range of multiple simulations and their mean.

    Args:
        qsim: 2D array of simulations, shape (num_timesteps, num_sims).
        x_vals: (optional) 1D array used as x-axis values (e.g. dates).
        qobs: (optional) 1D array of observations.

    Returns:
        ``(fig, ax)`` matplotlib handles.

    Raises:
        ValueError: For incorrect inputs.
    """
    import matplotlib.pyplot as plt
    import pandas as pd

    qsim = np.asarray(qsim)
    if qsim.ndim != 2:
        raise ValueError(
            f"Expected a (timesteps, members) 2-D ensemble for 'qsim'; got "
            f"an array with ndim={qsim.ndim}.")

    if x_vals is not None:
        if not isinstance(x_vals, (list, np.ndarray, pd.Series, pd.Index)):
            raise ValueError(
                f"Unsupported x-axis container {type(x_vals).__name__}; use "
                "a list, numpy array, pandas Series or Index.")

    if qobs is not None:
        if isinstance(qobs, (list, np.ndarray, pd.Series)):
            try:
                qobs = np.array(qobs, dtype=np.float64)
            except (ValueError, TypeError):
                raise ValueError(
                    "Observed discharge could not be cast to float — it "
                    "contains non-numeric entries.")
        else:
            raise ValueError(
                f"Unsupported 'qobs' container {type(qobs).__name__}; use "
                "a list, numpy array or pandas Series.")
        if qobs.ndim != 1:
            raise ValueError(
                f"Observed discharge must be a flat series; got "
                f"ndim={qobs.ndim}.")

    q05, q25, q75, q95 = np.percentile(qsim, [5, 25, 75, 95], axis=1)

    if x_vals is None:
        x_vals = np.arange(qsim.shape[0])

    fig, ax = plt.subplots(1)
    ax.plot(x_vals, np.mean(qsim, axis=1), color='red', label="Qsim mean",
            lw=0.5)
    if qobs is not None:
        ax.plot(x_vals, qobs, color='blue', label="Qobs", lw=0.5)

    ax.fill_between(x_vals, q05, q95, color=(1, 0, 0, 0.3),
                    label="5%/95% quantile")
    ax.fill_between(x_vals, q25, q75, color=(1, 0, 0, 0.1),
                    label="25%/75% quantile")
    ax.legend()

    return fig, ax
