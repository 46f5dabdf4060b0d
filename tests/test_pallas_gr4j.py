"""Pallas fused GR4J kernel parity tests (interpreter mode, CPU x64).

The fused kernels must reproduce the scan/conv XLA path (which itself is
golden-validated against the authors' Excel implementation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrmpg_tpu.ops import run_gr4j
from rrmpg_tpu.ops.pallas_gr4j import (
    BLOCK,
    gr4j_ensemble_mse_pallas,
    gr4j_simulate_pallas,
)


def _inputs(T, N, seed=0, x4_max=9.9):
    rng = np.random.default_rng(seed)
    prec = jnp.asarray(rng.uniform(0, 15, T))
    etp = jnp.asarray(rng.uniform(0, 4, T))
    qobs = jnp.asarray(rng.uniform(0, 5, T))
    params = {k: jnp.asarray(v) for k, v in {
        'x1': rng.uniform(100, 1200, N), 'x2': rng.uniform(-5, 3, N),
        'x3': rng.uniform(20, 300, N),
        'x4': rng.uniform(1.1, x4_max, N)}.items()}
    return prec, etp, qobs, params


def _xla_qsim(prec, etp, params):
    return jax.vmap(lambda p: run_gr4j(prec, etp, 0.4, 0.3, p)[0])(params)


@pytest.mark.slow
def test_traj_kernel_matches_xla():
    prec, etp, _, params = _inputs(200, BLOCK)
    qsim_p = gr4j_simulate_pallas(prec, etp, 0.4, 0.3, params, t_tile=64,
                                  interpret=True)
    qsim_x = _xla_qsim(prec, etp, params)
    assert np.allclose(np.asarray(qsim_p), np.asarray(qsim_x))


@pytest.mark.slow
def test_traj_kernel_t_padding():
    # T=150 is not a multiple of t_tile=64 -> exercises the padded tail.
    prec, etp, _, params = _inputs(150, BLOCK, seed=3)
    qsim_p = gr4j_simulate_pallas(prec, etp, 0.1, 0.6, params, t_tile=64,
                                  interpret=True)
    qsim_x = jax.vmap(
        lambda p: run_gr4j(prec, etp, 0.1, 0.6, p)[0])(params)
    assert qsim_p.shape == (BLOCK, 150)
    assert np.allclose(np.asarray(qsim_p), np.asarray(qsim_x))


@pytest.mark.slow
def test_mse_kernel_matches_xla():
    prec, etp, qobs, params = _inputs(200, BLOCK, seed=1)
    mse_p = gr4j_ensemble_mse_pallas(prec, etp, qobs, 0.4, 0.3, params,
                                     t_tile=64, interpret=True)
    qsim_x = _xla_qsim(prec, etp, params)
    mse_x = jnp.mean((qsim_x - qobs[None, :]) ** 2, axis=1)
    assert np.allclose(np.asarray(mse_p), np.asarray(mse_x))


def test_mse_kernel_member_padding():
    # N not a multiple of the (8, 128) block -> member padding path.
    prec, etp, qobs, params = _inputs(130, 100, seed=2)
    mse_p = gr4j_ensemble_mse_pallas(prec, etp, qobs, 0.2, 0.2, params,
                                     t_tile=64, interpret=True)
    assert mse_p.shape == (100,)
    qsim_x = jax.vmap(
        lambda p: run_gr4j(prec, etp, 0.2, 0.2, p)[0])(params)
    mse_x = jnp.mean((qsim_x - qobs[None, :]) ** 2, axis=1)
    assert np.allclose(np.asarray(mse_p), np.asarray(mse_x))


@pytest.mark.slow
def test_short_uh_registers():
    # 3/7-tap registers are exact for plain-GR4J bounds (x4 <= 2.9).
    prec, etp, qobs, params = _inputs(150, BLOCK, seed=4, x4_max=2.9)
    mse_p = gr4j_ensemble_mse_pallas(prec, etp, qobs, 0.4, 0.3, params,
                                     t_tile=64, num_uh1=3, num_uh2=7,
                                     interpret=True)
    qsim_x = _xla_qsim(prec, etp, params)
    mse_x = jnp.mean((qsim_x - qobs[None, :]) ** 2, axis=1)
    assert np.allclose(np.asarray(mse_p), np.asarray(mse_x))


def test_gr4j_class_pallas_engine():
    from rrmpg_tpu.models import GR4J

    model = GR4J()
    params = model.get_random_params(num=10)
    prec = np.random.default_rng(5).uniform(0, 10, 120)
    etp = np.random.default_rng(6).uniform(0, 3, 120)
    q_pallas = model.simulate(prec, etp, params=params, engine="pallas",
                              interpret=True)
    q_xla = model.simulate(prec, etp, params=params)
    assert np.allclose(q_pallas, q_xla, rtol=1e-4, atol=1e-6)


def test_gr4j_class_pallas_fit_interpret():
    from rrmpg_tpu.models import GR4J

    rng = np.random.default_rng(9)
    prec = rng.uniform(0, 12, 150)
    etp = rng.uniform(0, 4, 150)
    truth = GR4J(params={'x1': 300., 'x2': 1.0, 'x3': 80., 'x4': 2.0})
    qobs = truth.simulate(prec, etp).flatten()
    res = GR4J().fit(qobs, prec, etp, seed=0, maxiter=2, engine="pallas",
                     interpret=True)
    assert np.isfinite(res.fun)


def test_pallas_engine_rejects_storage():
    from rrmpg_tpu.models import GR4J

    with pytest.raises(ValueError):
        GR4J().simulate(np.ones(10), np.ones(10), return_storage=True,
                        engine="pallas")
