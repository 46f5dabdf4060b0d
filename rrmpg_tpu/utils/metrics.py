"""Evaluation metrics.

Two API levels:

* ``nse``, ``mse``, ``rmse``, ``kge``, ``alpha_nse``, ``beta_nse``,
  ``pearson_r`` -- pure jittable JAX reductions over a time axis.  They
  accept batched inputs (any number of leading/trailing batch dims via the
  ``axis`` argument), making them usable inside jitted/vmapped ensemble
  evaluations and device-side calibration loops.

* ``calc_nse``, ``calc_mse``, ``calc_rmse``, ``calc_kge``,
  ``calc_alpha_nse``, ``calc_beta_nse``, ``calc_r`` -- numpy-facing wrappers
  with the validation and error semantics of the reference implementation
  (``rrmpg/utils/metrics.py:29-300``), e.g. a RuntimeError when the NSE or
  KGE is undefined (``rrmpg/utils/metrics.py:64-69,171-180``).

The reference delegates the correlation coefficient to
``scipy.stats.pearsonr`` (``rrmpg/utils/metrics.py:280-300``); here it is a
closed-form jittable reduction so it can run fused inside device programs
(e.g. the KGE loss inside a differential-evolution generation).
"""

import jax.numpy as jnp
import numpy as np

from .array_checks import validate_array_input

__all__ = [
    "nse", "mse", "rmse", "kge", "alpha_nse", "beta_nse", "pearson_r",
    "calc_nse", "calc_mse", "calc_rmse", "calc_kge", "calc_alpha_nse",
    "calc_beta_nse", "calc_r", "calibration_loss",
]


def calibration_loss(loss_metric):
    """Minimization-oriented loss function for the ``fit`` methods.

    Error metrics ('mse', 'rmse') minimize as-is; efficiency scores
    ('nse', 'kge', ideal value 1) minimize ``1 - score`` -- the sign
    convention the reference's own ``fit_Q_SCA`` uses for KGE (and that
    its plain KGE loss gets wrong, see
    ``rrmpg/models/cemaneigehystgr4j.py:608-609``).

    Returns:
        ``loss(obs, sim) -> scalar``, jittable.
    """
    if loss_metric == "mse":
        return mse
    if loss_metric == "rmse":
        return rmse
    if loss_metric == "nse":
        return lambda obs, sim: 1.0 - nse(obs, sim)
    if loss_metric == "kge":
        return lambda obs, sim: 1.0 - kge(obs, sim)
    raise ValueError(
        f"Unsupported loss_metric {loss_metric!r}; supported: 'mse', "
        "'rmse', 'nse', 'kge'.")


# ---------------------------------------------------------------------------
# Jittable core reductions
# ---------------------------------------------------------------------------
#
# Missing observations are first-class: a NaN in ``obs`` marks a gap
# (e.g. a CAMELS ``-999`` sentinel, converted by the loader) and is
# excluded from every reduction -- the metric is computed over the valid
# timesteps only, in both ``obs`` and ``sim`` terms (std/mean of the
# simulation are taken over the *concurrent* valid steps, the standard
# convention for gauged-period skill scores).  With a gap-free ``obs``
# the masked forms reduce to the plain formulas.  NaNs in ``sim`` still
# propagate (a diverged member must poison its loss, not hide in a
# mask).

def _masked_obs(obs, axis):
    """(weights, obs-with-gaps-zeroed, valid count along axis)."""
    w = jnp.isfinite(obs).astype(obs.dtype)
    return w, jnp.where(w > 0, obs, 0.0), jnp.sum(w, axis=axis)


def _wmean(w, x, n, axis):
    return jnp.sum(w * x, axis=axis) / n


def mse(obs, sim, axis=-1):
    """Mean squared error along ``axis`` (jittable, batchable).

    NaNs in ``obs`` mark missing observations and are excluded (mean
    over the valid timesteps).
    """
    obs = jnp.asarray(obs)
    sim = jnp.asarray(sim)
    w, obs0, n = _masked_obs(obs, axis)
    return jnp.sum(w * (obs0 - sim) ** 2, axis=axis) / n


def rmse(obs, sim, axis=-1):
    """Root mean squared error along ``axis`` (jittable, batchable)."""
    return jnp.sqrt(mse(obs, sim, axis=axis))


def nse(obs, sim, axis=-1):
    """Nash-Sutcliffe efficiency along ``axis`` (jittable, batchable).

    Returns ``-inf`` where the observation variance is zero (the validated
    wrapper ``calc_nse`` raises instead, matching the reference).  NaNs in
    ``obs`` mark missing observations and are excluded.
    """
    obs = jnp.asarray(obs)
    sim = jnp.asarray(sim)
    w, obs0, n = _masked_obs(obs, axis)
    obs_mean = jnp.expand_dims(_wmean(w, obs0, n, axis), axis)
    denominator = jnp.sum(w * (obs0 - obs_mean) ** 2, axis=axis)
    numerator = jnp.sum(w * (sim - obs0) ** 2, axis=axis)
    return jnp.where(denominator == 0, -jnp.inf, 1.0 - numerator /
                     jnp.where(denominator == 0, 1.0, denominator))


def pearson_r(obs, sim, axis=-1):
    """Pearson correlation coefficient along ``axis`` (jittable).

    NaNs in ``obs`` mark missing observations; the correlation is over
    the concurrent valid steps.
    """
    obs = jnp.asarray(obs)
    sim = jnp.asarray(sim)
    w, obs0, n = _masked_obs(obs, axis)
    obs_c = obs0 - jnp.expand_dims(_wmean(w, obs0, n, axis), axis)
    sim_c = sim - jnp.expand_dims(_wmean(w, sim, n, axis), axis)
    cov = jnp.sum(w * obs_c * sim_c, axis=axis)
    denom = jnp.sqrt(jnp.sum(w * obs_c ** 2, axis=axis) *
                     jnp.sum(w * sim_c ** 2, axis=axis))
    return cov / denom


def _wstd(w, x, n, axis):
    """Population std over the valid steps (matches ``jnp.std``)."""
    mean = jnp.expand_dims(_wmean(w, x, n, axis), axis)
    return jnp.sqrt(jnp.sum(w * (x - mean) ** 2, axis=axis) / n)


def alpha_nse(obs, sim, axis=-1):
    """Alpha-NSE decomposition, sigma_sim / sigma_obs (jittable)."""
    obs = jnp.asarray(obs)
    sim = jnp.asarray(sim)
    w, obs0, n = _masked_obs(obs, axis)
    return _wstd(w, sim, n, axis) / _wstd(w, obs0, n, axis)


def beta_nse(obs, sim, axis=-1):
    """Beta-NSE decomposition, (mu_sim - mu_obs) / sigma_obs (jittable)."""
    obs = jnp.asarray(obs)
    sim = jnp.asarray(sim)
    w, obs0, n = _masked_obs(obs, axis)
    return ((_wmean(w, sim, n, axis) - _wmean(w, obs0, n, axis))
            / _wstd(w, obs0, n, axis))


def kge(obs, sim, axis=-1):
    """Kling-Gupta efficiency (Gupta et al. 2009) along ``axis`` (jittable).

    Same decomposition as the reference (``rrmpg/utils/metrics.py:182-188``):
    ``1 - sqrt((r-1)^2 + (alpha-1)^2 + (beta-1)^2)`` with
    ``alpha = std(sim)/std(obs)`` and ``beta = mean(sim)/mean(obs)``.
    NaNs in ``obs`` mark missing observations and are excluded.
    """
    obs = jnp.asarray(obs)
    sim = jnp.asarray(sim)
    w, obs0, n = _masked_obs(obs, axis)
    r = pearson_r(obs, sim, axis=axis)
    alpha = _wstd(w, sim, n, axis) / _wstd(w, obs0, n, axis)
    beta = _wmean(w, sim, n, axis) / _wmean(w, obs0, n, axis)
    return 1.0 - jnp.sqrt((r - 1.0) ** 2 + (alpha - 1.0) ** 2 +
                          (beta - 1.0) ** 2)


# ---------------------------------------------------------------------------
# Validated numpy-facing wrappers (reference error semantics)
# ---------------------------------------------------------------------------

def _validated_pair(obs, sim):
    obs = validate_array_input(obs, np.float64, 'obs')
    sim = validate_array_input(sim, np.float64, 'sim')
    if len(obs) != len(sim):
        raise ValueError(
            f"obs and sim lengths differ: {len(obs)} vs {len(sim)}.")
    # NaNs in obs mark missing observations (e.g. CAMELS -999
    # sentinels): score over the valid timesteps only.  (Divergence from
    # the reference, which silently returns nan for gapped series.)
    valid = np.isfinite(obs)
    if not valid.all():
        if not valid.any():
            raise RuntimeError(
                "Every observation is missing (NaN); no valid timesteps "
                "to score.")
        obs, sim = obs[valid], sim[valid]
    return obs, sim


def calc_nse(obs, sim):
    """Nash-Sutcliffe model efficiency with reference error semantics.

    Raises RuntimeError when all observations are equal, matching
    ``rrmpg/utils/metrics.py:64-69``.
    """
    obs, sim = _validated_pair(obs, sim)
    denominator = np.sum((obs - np.mean(obs)) ** 2)
    if denominator == 0:
        raise RuntimeError(
            "NSE is undefined when the observed series is constant (its "
            "variance is zero); consider MSE for such series.")
    return float(1 - np.sum((sim - obs) ** 2) / denominator)


def calc_rmse(obs, sim):
    """Root mean squared error."""
    obs, sim = _validated_pair(obs, sim)
    return float(np.sqrt(np.mean((obs - sim) ** 2)))


def calc_mse(obs, sim):
    """Mean squared error."""
    obs, sim = _validated_pair(obs, sim)
    return float(np.mean((obs - sim) ** 2))


def calc_kge(obs, sim):
    """Kling-Gupta efficiency with reference error semantics.

    Raises RuntimeError when the mean or standard deviation of the
    observations is zero, matching ``rrmpg/utils/metrics.py:171-180``.
    """
    obs, sim = _validated_pair(obs, sim)
    mean_obs = np.mean(obs)
    if mean_obs == 0:
        raise RuntimeError(
            "KGE requires a nonzero observation mean (beta term divides "
            "by it).")
    std_obs = np.std(obs)
    if std_obs == 0:
        raise RuntimeError(
            "KGE requires a nonzero observation standard deviation (alpha "
            "term divides by it).")
    r = np.corrcoef(obs, sim)[0, 1]
    alpha = np.std(sim) / std_obs
    beta = np.mean(sim) / mean_obs
    return float(1 - np.sqrt((r - 1) ** 2 + (alpha - 1) ** 2 +
                             (beta - 1) ** 2))


def calc_alpha_nse(obs, sim):
    """Alpha decomposition of the NSE (sigma_sim / sigma_obs)."""
    obs, sim = _validated_pair(obs, sim)
    std_obs = np.std(obs)
    if std_obs == 0:
        raise RuntimeError(
            "Undefined for observations with zero standard deviation.")
    return float(np.std(sim) / std_obs)


def calc_beta_nse(obs, sim):
    """Beta decomposition of the NSE ((mu_sim - mu_obs) / sigma_obs)."""
    obs, sim = _validated_pair(obs, sim)
    std_obs = np.std(obs)
    if std_obs == 0:
        raise RuntimeError(
            "Undefined for observations with zero standard deviation.")
    mean_obs = np.mean(obs)
    if mean_obs == 0:
        raise RuntimeError(
            "Undefined for observations with zero mean.")
    return float((np.mean(sim) - mean_obs) / std_obs)


def calc_r(obs, sim):
    """Pearson r coefficient and two-sided p-value.

    Returns a ``(r, p_value)`` tuple like the scipy interface the reference
    exposes (``rrmpg/utils/metrics.py:280-300``).
    """
    obs, sim = _validated_pair(obs, sim)
    from scipy.stats import pearsonr
    return pearsonr(obs, sim)
