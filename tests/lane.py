"""Dtype-lane helpers for the test suite.

The suite runs in two lanes (see ``conftest.py``): the default float64
golden-parity lane and the ``RRMPG_TEST_DTYPE=float32`` production-dtype
lane.  Numerical-agreement tests pick their tolerance per lane with
:func:`tol`; tests whose *contract* is float64 bit-parity (Excel/MATLAB
goldens at machine precision, the C++ float64 oracle) are marked
``@pytest.mark.f64only`` instead and skip in the float32 lane.
"""

import os

TEST_DTYPE = os.environ.get("RRMPG_TEST_DTYPE", "float64")
IS_F32 = TEST_DTYPE == "float32"


def tol(f64, f32):
    """The tolerance for the active dtype lane."""
    return f32 if IS_F32 else f64
