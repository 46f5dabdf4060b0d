"""Device-resident global optimization for model calibration.

The reference calibrates with ``scipy.optimize.differential_evolution``,
evaluating thousands of model runs one after another in Python
(``rrmpg/models/gr4j.py:247``, nfev ~2.5k-14k).  Here the optimizer itself
is a JAX program: every generation evaluates the whole population as one
``vmap``-batched device call, and the full evolution loop runs inside a
single ``lax.while_loop`` under ``jit`` -- zero host round-trips until the
result is fetched.  On a mesh, the population axis can be sharded so each
generation's simulations spread across chips with an implicit cross-device
argmin (GSPMD inserts the collectives).

The algorithm follows scipy's default configuration: ``best1bin`` strategy,
latin-hypercube initialization, dithered mutation in [0.5, 1), binomial
crossover 0.7, population of ``popsize * dim`` members, and scipy's
convergence criterion ``std(E) <= atol + tol * |mean(E)|``.  Results are
quality-comparable but not bit-identical to scipy (different RNG streams).
"""

import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import default_float


class OptimizeResult(typing.NamedTuple):
    """Result of a calibration run (scipy-compatible field names)."""
    x: np.ndarray          # best parameter vector, shape (dim,)
    fun: float             # best objective value
    nit: int               # number of generations performed
    nfev: int              # number of objective evaluations
    success: bool
    message: str
    population: np.ndarray          # final population, (P, dim)
    population_energies: np.ndarray  # final energies, (P,)


def _latin_hypercube(key, pop_size, dim, dtype):
    """Latin-hypercube sample in [0, 1]^dim."""
    key_perm, key_u = jax.random.split(key)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, pop_size))(
            jax.random.split(key_perm, dim))          # (dim, P)
    u = jax.random.uniform(key_u, (dim, pop_size), dtype=dtype)
    samples = (perms.astype(dtype) + u) / pop_size
    return samples.T                                   # (P, dim)


def differential_evolution(objective, bounds, key=None, popsize=15,
                           maxiter=1000, tol=0.01, atol=0.0,
                           mutation=(0.5, 1.0), recombination=0.7,
                           seed=None, batched=False):
    """Global minimization with a fully jitted differential evolution.

    Args:
        objective: function mapping a (dim,) parameter vector to a scalar
            loss.  Must be jit-traceable; it is vmapped over the population.
            With ``batched=True``, the function instead maps the whole
            (P, dim) population to (P,) losses in one call -- use this to
            plug in fused ensemble kernels (e.g.
            :func:`rrmpg_tpu.ops.gr4j_ensemble_mse_pallas`).
        bounds: sequence of (low, high) pairs, one per dimension.
        key: jax PRNG key (alternatively pass an int ``seed``).
        popsize: population multiplier; total population = popsize * dim.
        maxiter: maximum number of generations.
        tol, atol: relative/absolute convergence tolerance on the energy
            spread (scipy semantics).
        mutation: (min, max) dithering range for the mutation factor.
        recombination: crossover probability.
        seed: int seed used if ``key`` is None.

    Returns:
        :class:`OptimizeResult`.
    """
    if key is None:
        key = jax.random.PRNGKey(0 if seed is None else seed)

    dtype = default_float()
    lows = jnp.asarray([b[0] for b in bounds], dtype=dtype)
    highs = jnp.asarray([b[1] for b in bounds], dtype=dtype)
    dim = len(bounds)
    pop_size = popsize * dim
    mut_lo, mut_hi = mutation

    batch_objective = objective if batched else jax.vmap(objective)

    def scale(norm_pop):
        return lows + norm_pop * (highs - lows)

    @jax.jit
    def run(key):
        key, init_key = jax.random.split(key)
        pop = _latin_hypercube(init_key, pop_size, dim, dtype)
        energies = batch_objective(scale(pop))

        def converged(energies):
            finite = jnp.isfinite(energies)
            mean = jnp.mean(energies)
            std = jnp.std(energies)
            return jnp.all(finite) & (std <= atol + tol * jnp.abs(mean))

        def cond(state):
            _, _, energies, nit = state
            return (nit < maxiter) & ~converged(energies)

        def body(state):
            key, pop, energies, nit = state
            (key, f_key, r_key, cross_key, fill_key,
             resample_key) = jax.random.split(key, 6)

            best = pop[jnp.argmin(energies)]

            # best1bin mutation with dithered F.
            f = jax.random.uniform(f_key, (), dtype=dtype,
                                   minval=mut_lo, maxval=mut_hi)
            idx = jax.random.randint(r_key, (pop_size, 2), 0, pop_size - 1)
            own = jnp.arange(pop_size)[:, None]
            idx = jnp.where(idx >= own, idx + 1, idx)  # exclude self
            mutants = best[None, :] + f * (pop[idx[:, 0]] - pop[idx[:, 1]])

            # Binomial crossover with one guaranteed mutant dimension.
            cross = (jax.random.uniform(cross_key, (pop_size, dim),
                                        dtype=dtype) < recombination)
            fill = jax.random.randint(fill_key, (pop_size,), 0, dim)
            cross = cross | (jnp.arange(dim)[None, :] == fill[:, None])
            trials = jnp.where(cross, mutants, pop)

            # Out-of-bounds components are resampled uniformly (scipy's
            # _ensure_constraint behavior).
            resample = jax.random.uniform(resample_key, (pop_size, dim),
                                          dtype=dtype)
            out_of_bounds = (trials < 0.0) | (trials > 1.0)
            trials = jnp.where(out_of_bounds, resample, trials)

            trial_energies = batch_objective(scale(trials))
            improved = trial_energies < energies
            pop = jnp.where(improved[:, None], trials, pop)
            energies = jnp.where(improved, trial_energies, energies)
            return key, pop, energies, nit + 1

        state = (key, pop, energies, jnp.asarray(0))
        key, pop, energies, nit = lax.while_loop(cond, body, state)
        best_idx = jnp.argmin(energies)
        return (scale(pop), energies, nit, scale(pop)[best_idx],
                energies[best_idx], converged(energies))

    pop, energies, nit, x, fun, success = jax.device_get(run(key))
    nit = int(nit)
    return OptimizeResult(
        x=np.asarray(x), fun=float(fun), nit=nit,
        nfev=pop_size * (nit + 1), success=bool(success),
        message=("Optimization terminated successfully."
                 if success else
                 "Maximum number of iterations has been exceeded."),
        population=np.asarray(pop),
        population_energies=np.asarray(energies))


def random_search(objective, sample_fn, num, key=None, seed=None,
                  batch_size=None):
    """Monte-Carlo minimization: sample ``num`` candidates, keep the best.

    Args:
        objective: (dim,) -> scalar loss, jit-traceable (vmapped here).
        sample_fn: ``sample_fn(key, num) -> (num, dim)`` candidate sampler.
        num: number of candidates.
        key / seed: PRNG key or int seed.
        batch_size: optional chunking to bound memory for huge ``num``.

    Returns:
        :class:`OptimizeResult` (population fields hold the *last* batch).
    """
    if key is None:
        key = jax.random.PRNGKey(0 if seed is None else seed)

    batch_objective = jax.jit(jax.vmap(objective))
    if batch_size is None:
        batch_size = num

    best_x, best_fun = None, np.inf
    last_pop, last_energies = None, None
    remaining = num
    while remaining > 0:
        n = min(batch_size, remaining)
        key, sub = jax.random.split(key)
        candidates = sample_fn(sub, n)
        energies = np.asarray(batch_objective(candidates))
        i = int(np.nanargmin(energies))
        if energies[i] < best_fun:
            best_fun = float(energies[i])
            best_x = np.asarray(candidates[i])
        last_pop, last_energies = np.asarray(candidates), energies
        remaining -= n

    return OptimizeResult(
        x=best_x, fun=best_fun, nit=1, nfev=num, success=True,
        message="Random search finished.", population=last_pop,
        population_energies=last_energies)
