"""Parity tests for the fused HBV-Edu Pallas kernel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rrmpg_tpu.ops import run_hbvedu
from rrmpg_tpu.ops.pallas_hbv import hbv_ensemble_mse_pallas


def _inputs(T=300, N=1024, seed=3):
    rng = np.random.default_rng(seed)
    temp = jnp.asarray(rng.uniform(-15, 25, T))
    prec = jnp.asarray(rng.uniform(0, 20, T))
    month = jnp.asarray(rng.integers(0, 12, T))
    qobs = jnp.asarray(rng.uniform(0, 3, T))
    pe_m = jnp.asarray(rng.uniform(0, 4, 12))
    t_m = jnp.asarray(rng.uniform(-5, 15, 12))
    params = {k: jnp.asarray(v) for k, v in {
        'T_t': rng.uniform(-1, 1, N), 'DD': rng.uniform(3, 7, N),
        'FC': rng.uniform(100, 200, N), 'Beta': rng.uniform(1, 7, N),
        'C': rng.uniform(0.01, 0.07, N), 'PWP': rng.uniform(90, 180, N),
        'K_0': rng.uniform(0.05, 0.2, N), 'K_1': rng.uniform(0.01, 0.1, N),
        'K_2': rng.uniform(0.01, 0.05, N),
        'K_p': rng.uniform(0.01, 0.05, N),
        'L': rng.uniform(2, 5, N)}.items()}
    return temp, prec, month, pe_m, t_m, qobs, params


def test_hbv_mse_kernel_matches_xla():
    temp, prec, month, pe_m, t_m, qobs, params = _inputs()
    mse_p = hbv_ensemble_mse_pallas(temp, prec, month, pe_m, t_m, qobs,
                                    0.0, 100.0, 3.0, 10.0, params,
                                    t_tile=128, interpret=True)
    q_x = jax.vmap(lambda p: run_hbvedu(temp, prec, month, pe_m, t_m, 0.0,
                                        100.0, 3.0, 10.0, p)[0])(params)
    mse_x = jnp.mean((q_x - qobs[None, :]) ** 2, axis=1)
    assert np.allclose(np.asarray(mse_p), np.asarray(mse_x))


def test_hbv_mse_kernel_member_padding():
    temp, prec, month, pe_m, t_m, qobs, params = _inputs(T=130, N=70)
    mse_p = hbv_ensemble_mse_pallas(temp, prec, month, pe_m, t_m, qobs,
                                    0.0, 100.0, 3.0, 10.0, params,
                                    t_tile=64, interpret=True)
    assert mse_p.shape == (70,)
    q_x = jax.vmap(lambda p: run_hbvedu(temp, prec, month, pe_m, t_m, 0.0,
                                        100.0, 3.0, 10.0, p)[0])(params)
    mse_x = jnp.mean((q_x - qobs[None, :]) ** 2, axis=1)
    assert np.allclose(np.asarray(mse_p), np.asarray(mse_x))


@pytest.mark.slow
def test_hbv_simulate_pallas_matches_xla():
    import jax.numpy as jnp
    from rrmpg_tpu.ops.hbvedu import run_hbvedu
    from rrmpg_tpu.ops.pallas_hbv import hbv_simulate_pallas

    rng = np.random.default_rng(21)
    T, N = 400, 5
    temp = jnp.asarray(rng.uniform(-10, 25, T))
    prec = jnp.asarray(rng.uniform(0, 15, T))
    month = jnp.asarray(rng.integers(0, 12, T))
    pe_m = jnp.asarray(rng.uniform(1, 4, 12))
    t_m = jnp.asarray(rng.uniform(-5, 20, 12))
    params = {
        'T_t': jnp.asarray(rng.uniform(-1, 1, N)),
        'DD': jnp.asarray(rng.uniform(3, 7, N)),
        'FC': jnp.asarray(rng.uniform(100, 200, N)),
        'Beta': jnp.asarray(rng.uniform(1, 7, N)),
        'C': jnp.asarray(rng.uniform(0.01, 0.07, N)),
        'PWP': jnp.asarray(rng.uniform(90, 180, N)),
        'K_0': jnp.asarray(rng.uniform(0.05, 0.2, N)),
        'K_1': jnp.asarray(rng.uniform(0.01, 0.1, N)),
        'K_2': jnp.asarray(rng.uniform(0.01, 0.05, N)),
        'K_p': jnp.asarray(rng.uniform(0.01, 0.05, N)),
        'L': jnp.asarray(rng.uniform(2, 5, N)),
    }
    q_p = hbv_simulate_pallas(temp, prec, month, pe_m, t_m, 5.0, 120.0,
                              1.0, 1.0, params, t_tile=128,
                              interpret=True)
    for i in range(N):
        p_i = {k: v[i] for k, v in params.items()}
        q_x, *_ = run_hbvedu(temp, prec, month, pe_m, t_m, 5.0, 120.0,
                             1.0, 1.0, p_i)
        assert np.allclose(np.asarray(q_p[i]), np.asarray(q_x),
                           rtol=1e-6, atol=1e-8)


def test_hbv_class_pallas_engine():
    from rrmpg_tpu.models import HBVEdu

    model = HBVEdu()
    rng = np.random.default_rng(3)
    T = 200
    kwargs = dict(temp=rng.uniform(-5, 20, T), prec=rng.uniform(0, 10, T),
                  month=rng.integers(1, 13, T).astype(np.int64),
                  PE_m=rng.uniform(1, 4, 12), T_m=rng.uniform(0, 15, 12),
                  snow_init=2.0, soil_init=100.0)
    params = model.get_random_params(num=3)
    q_x = model.simulate(params=params, **kwargs)
    q_p = model.simulate(params=params, engine="pallas", interpret=True,
                         **kwargs)
    assert q_p.shape == q_x.shape
    assert np.allclose(q_p, q_x, rtol=1e-6, atol=1e-8)


def test_hbv_stats_variant_matches_trajectory():
    """stats=True equals the statistics of the fused trajectory."""
    import jax.numpy as jnp

    from rrmpg_tpu.ops.pallas_hbv import (
        hbv_ensemble_mse_pallas,
        hbv_simulate_pallas,
    )

    rng = np.random.default_rng(0)
    T, N = 150, 16
    temp = jnp.asarray(rng.uniform(-10, 20, T))
    prec = jnp.asarray(rng.uniform(0, 12, T))
    month = jnp.asarray(rng.integers(0, 12, T))
    pe_m = jnp.asarray(rng.uniform(1, 4, 12))
    t_m = jnp.asarray(rng.uniform(-5, 15, 12))
    qobs = jnp.asarray(rng.uniform(0, 5, T))
    from rrmpg_tpu.models import HBVEdu
    params = {k: jnp.asarray(rng.uniform(lo, hi, N)) for k, (lo, hi)
              in HBVEdu._default_bounds.items()}

    stats = np.asarray(hbv_ensemble_mse_pallas(
        temp, prec, month, pe_m, t_m, qobs, 0.0, 0.0, 0.0, 0.0,
        params, interpret=True, stats=True))
    assert stats.shape == (4, N)
    qsim = np.asarray(hbv_simulate_pallas(
        temp, prec, month, pe_m, t_m, 0.0, 0.0, 0.0, 0.0, params,
        interpret=True))
    qo = np.asarray(qobs)
    np.testing.assert_allclose(stats[0],
                               np.mean((qsim - qo) ** 2, axis=1),
                               rtol=1e-6)
    np.testing.assert_allclose(stats[1], qsim.mean(axis=1), rtol=1e-6)
    np.testing.assert_allclose(stats[3], (qsim * qo).mean(axis=1),
                               rtol=1e-6)
