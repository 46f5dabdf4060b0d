"""Ensemble plotting tests (headless backend)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from rrmpg_tpu.utils.plot_utils import plot_qsim_range


def test_plot_qsim_range_basic():
    qsim = np.random.uniform(0, 5, (100, 30))
    fig, ax = plot_qsim_range(qsim)
    assert len(ax.lines) == 1
    assert len(ax.collections) == 2  # two quantile bands


def test_plot_qsim_range_with_obs_and_x():
    qsim = np.random.uniform(0, 5, (50, 10))
    qobs = np.random.uniform(0, 5, 50)
    x = np.arange(50)
    fig, ax = plot_qsim_range(qsim, x_vals=x, qobs=qobs)
    assert len(ax.lines) == 2


def test_plot_qsim_range_errors():
    with pytest.raises(ValueError):
        plot_qsim_range(np.zeros(10))  # not 2-D
    with pytest.raises(ValueError):
        plot_qsim_range(np.zeros((10, 3)), qobs=np.zeros((5, 2)))
    with pytest.raises(ValueError):
        plot_qsim_range(np.zeros((10, 3)), x_vals="dates")
