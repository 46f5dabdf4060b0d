"""Fit-path coverage across the remaining model classes + engine guards."""

import numpy as np
import pytest

from rrmpg_tpu.models import Cemaneige, CemaneigeGR4J, GR4J
from rrmpg_tpu.parallel import default_mesh
from rrmpg_tpu.tools import monte_carlo


def _met(T=200, seed=4):
    rng = np.random.default_rng(seed)
    prec = rng.uniform(0, 12, T)
    mean_t = rng.uniform(-8, 12, T)
    return prec, mean_t, mean_t - 2, mean_t + 2, rng.uniform(0, 3, T)


def test_cemaneige_fit_smoke():
    prec, mean_t, min_t, max_t, etp = _met()
    obs = np.random.default_rng(5).uniform(0, 4, 200)
    res = Cemaneige().fit(obs, prec, mean_t, min_t, max_t,
                          met_station_height=500,
                          altitudes=[400, 600, 800], seed=0, maxiter=3,
                          tol=0.0)
    assert res.nit == 3 and np.isfinite(res.fun)


@pytest.mark.slow
def test_cemaneigegr4j_fit_recovers_params():
    prec, mean_t, min_t, max_t, etp = _met(T=400)
    true = {'CTG': 0.25, 'Kf': 3.74, 'x1': 300.0, 'x2': 1.0, 'x3': 90.0,
            'x4': 2.0}
    model = CemaneigeGR4J(params=true)
    qobs = model.simulate(prec, mean_t, min_t, max_t, etp,
                          met_station_height=500).flatten()
    res = CemaneigeGR4J().fit(qobs, prec, mean_t, min_t, max_t, etp,
                              met_station_height=500, seed=0, maxiter=150)
    assert res.fun < 1e-3


def test_invalid_engine_raises():
    prec, mean_t, min_t, max_t, etp = _met()
    obs = np.zeros(200)
    with pytest.raises(ValueError):
        GR4J().simulate(prec, etp, engine="cuda")
    with pytest.raises(ValueError):
        GR4J().fit(obs, prec, etp, engine="cuda")
    with pytest.raises(ValueError):
        CemaneigeGR4J().fit(obs, prec, mean_t, min_t, max_t, etp,
                            met_station_height=500, engine="cuda")


def test_monte_carlo_with_mesh():
    model = GR4J()
    prec = np.random.uniform(0, 10, 150)
    etp = np.random.uniform(0, 3, 150)
    qobs = np.random.uniform(0, 2, 150)
    result = monte_carlo(model, 24, qobs=qobs, mesh=default_mesh(),
                         prec=prec, etp=etp)
    assert result['qsim'].shape == (150, 24)
    assert np.isfinite(result['mse']).all()
