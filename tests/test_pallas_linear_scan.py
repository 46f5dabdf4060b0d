"""Parity tests for the fused single-series linear-scan Pallas kernel."""

import numpy as np
import pytest

from rrmpg_tpu.ops.abc import run_abcmodel
from rrmpg_tpu.ops.pallas_linear_scan import abc_fused_pallas


@pytest.mark.parametrize("T,rows", [(1000, 128), (40000, 128),
                                    (70000, 256)])
def test_abc_fused_matches_scan(T, rows):
    rng = np.random.default_rng(T)
    prec = rng.uniform(0, 20, T)
    params = {'a': 0.3, 'b': 0.4, 'c': 0.12}
    q_ref, s_ref = run_abcmodel(prec, 5.0, params)
    q_p, s_p = abc_fused_pallas(prec, 5.0, params, rows=rows,
                                interpret=True)
    assert np.allclose(np.asarray(q_p), np.asarray(q_ref))
    assert np.allclose(np.asarray(s_p), np.asarray(s_ref))


def test_abc_fused_edge_coefficients():
    rng = np.random.default_rng(9)
    prec = rng.uniform(0, 20, 20000)
    for c in (0.0, 1.0):
        params = {'a': 0.3, 'b': 0.4, 'c': c}
        q_ref, s_ref = run_abcmodel(prec, 2.0, params)
        q_p, s_p = abc_fused_pallas(prec, 2.0, params, interpret=True)
        assert np.allclose(np.asarray(s_p), np.asarray(s_ref))
        assert np.allclose(np.asarray(q_p), np.asarray(q_ref))


def test_abc_fused_rejects_bad_rows():
    with pytest.raises(ValueError):
        abc_fused_pallas(np.ones(100), 0.0,
                         {'a': 0.1, 'b': 0.1, 'c': 0.1}, rows=100,
                         interpret=True)


@pytest.mark.parametrize("T,rows", [(1000, 128), (40000, 256),
                                    (70000, 512)])
def test_abc_single_program_matches_scan(T, rows):
    from rrmpg_tpu.ops.pallas_linear_scan import abc_fused_single_pallas

    rng = np.random.default_rng(T + 1)
    prec = rng.uniform(0, 20, T)
    params = {'a': 0.25, 'b': 0.35, 'c': 0.2}
    q_ref, s_ref = run_abcmodel(prec, 3.0, params)
    q_p, s_p = abc_fused_single_pallas(prec, 3.0, params, rows=rows,
                                       interpret=True)
    assert np.allclose(np.asarray(q_p), np.asarray(q_ref))
    assert np.allclose(np.asarray(s_p), np.asarray(s_ref))


def test_abc_single_program_edge_coefficients():
    from rrmpg_tpu.ops.pallas_linear_scan import abc_fused_single_pallas

    prec = np.random.default_rng(11).uniform(0, 20, 20000)
    for c in (0.0, 1.0):
        params = {'a': 0.3, 'b': 0.4, 'c': c}
        q_ref, s_ref = run_abcmodel(prec, 2.0, params)
        q_p, s_p = abc_fused_single_pallas(prec, 2.0, params, rows=128,
                                           interpret=True)
        assert np.allclose(np.asarray(s_p), np.asarray(s_ref))
        assert np.allclose(np.asarray(q_p), np.asarray(q_ref))


def test_abcmodel_class_pallas_engine():
    from rrmpg_tpu.models import ABCModel

    model = ABCModel()
    prec = np.random.default_rng(5).uniform(0, 15, 3000)
    params = model.get_random_params(num=2)
    q_x, s_x = model.simulate(prec, initial_state=1.5, params=params,
                              return_storage=True)
    q_p, s_p = model.simulate(prec, initial_state=1.5, params=params,
                              return_storage=True, engine="pallas",
                              interpret=True)
    assert q_p.shape == q_x.shape == (3000, 2)
    assert np.allclose(q_p, q_x)
    assert np.allclose(s_p, s_x)


def test_abcmodel_class_rejects_unknown_engine():
    from rrmpg_tpu.models import ABCModel

    with pytest.raises(ValueError):
        ABCModel().simulate(np.ones(10), engine="fortran")
