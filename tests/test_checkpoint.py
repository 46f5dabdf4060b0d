"""Checkpoint/resume tests for calibration state."""

import numpy as np
import pytest

from rrmpg_tpu.tools import (
    differential_evolution,
    load_checkpoint,
    save_checkpoint,
)


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    state = {'pop': np.random.uniform(size=(8, 3)),
             'energies': np.random.uniform(size=8),
             'nit': np.asarray(17)}
    save_checkpoint(path, state, metadata={'model': 'gr4j'})
    loaded = load_checkpoint(path)
    assert np.allclose(loaded['pop'], state['pop'])
    assert int(loaded['nit']) == 17
    assert str(loaded['metadata']['model']) == 'gr4j'


def test_de_checkpoint_resume_matches_uninterrupted(tmp_path):
    import jax.numpy as jnp

    target = jnp.asarray([0.5, -2.0])

    def objective(x):
        return jnp.sum((x - target) ** 2)

    bounds = [(-5, 5)] * 2
    full = differential_evolution(objective, bounds, seed=7, maxiter=40,
                                  tol=0.0)

    path = str(tmp_path / "de.npz")
    # Run 15 generations with checkpointing...
    differential_evolution(objective, bounds, seed=7, maxiter=15, tol=0.0,
                           checkpoint_path=path, checkpoint_every=5)
    # ...then resume to 40 total.
    resumed = differential_evolution(objective, bounds, seed=7, maxiter=40,
                                     tol=0.0, resume_from=path)
    assert resumed.nit == full.nit == 40
    # Same seed + same chunked RNG stream => identical evolution.
    assert np.allclose(resumed.x, full.x)
    assert np.allclose(resumed.population_energies,
                       full.population_energies)


def test_de_chunked_equals_monolithic():
    import jax.numpy as jnp

    def objective(x):
        return jnp.sum(x ** 2)

    bounds = [(-3, 3)] * 2
    mono = differential_evolution(objective, bounds, seed=3, maxiter=30,
                                  tol=0.0)
    chunked = differential_evolution(objective, bounds, seed=3, maxiter=30,
                                     tol=0.0, checkpoint_every=7)
    assert np.allclose(mono.x, chunked.x)
    assert mono.nit == chunked.nit


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp
    from rrmpg_tpu.tools.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = {'pop': jnp.arange(12.0).reshape(3, 4),
             'energies': jnp.asarray([1.0, 2.0, 3.0]),
             'nit': jnp.asarray(7)}
    path = str(tmp_path / 'ckpt')
    save_checkpoint_orbax(path, state)
    restored = load_checkpoint_orbax(path)
    for k in state:
        assert np.allclose(np.asarray(restored[k]), np.asarray(state[k]))


def test_de_checkpoint_resume_with_mesh(tmp_path):
    # The sharded-population resume branch: interrupted evolution on a
    # mesh must continue bit-identically to an uninterrupted run.
    import jax.numpy as jnp
    from rrmpg_tpu.parallel.mesh import default_mesh
    from rrmpg_tpu.tools.calibration import differential_evolution

    mesh = default_mesh()
    target = jnp.asarray([0.2, -0.8, 1.5, 0.4])
    bounds = [(-2, 2), (-2, 2), (0, 3), (-1, 1)]

    def obj(x):
        return jnp.sum((x - target) ** 2)

    path = str(tmp_path / "de_mesh.npz")
    full = differential_evolution(obj, bounds, seed=5, popsize=16,
                                  maxiter=12, tol=0.0, mesh=mesh)
    differential_evolution(obj, bounds, seed=5, popsize=16, maxiter=6,
                           tol=0.0, mesh=mesh, checkpoint_path=path,
                           checkpoint_every=6)
    resumed = differential_evolution(obj, bounds, seed=5, popsize=16,
                                     maxiter=12, tol=0.0, mesh=mesh,
                                     resume_from=path)
    assert resumed.nit == full.nit
    assert np.allclose(resumed.population, full.population)
    assert np.allclose(resumed.x, full.x)


def test_de_orbax_checkpoint_resume(tmp_path):
    # Non-.npz checkpoint paths route through the Orbax backend.
    import jax.numpy as jnp
    from rrmpg_tpu.tools.calibration import differential_evolution

    target = jnp.asarray([0.5, -0.5])
    bounds = [(-2, 2), (-2, 2)]

    def obj(x):
        return jnp.sum((x - target) ** 2)

    path = str(tmp_path / "de_orbax_ckpt")
    full = differential_evolution(obj, bounds, seed=2, maxiter=10,
                                  tol=0.0)
    differential_evolution(obj, bounds, seed=2, maxiter=5, tol=0.0,
                           checkpoint_path=path, checkpoint_every=5)
    resumed = differential_evolution(obj, bounds, seed=2, maxiter=10,
                                     tol=0.0, resume_from=path)
    assert resumed.nit == full.nit
    assert np.allclose(resumed.population, full.population)
