"""Test configuration: CPU backend, 8 virtual devices, dtype lane switch.

Golden-data validation runs against the reference's float64 Excel/MATLAB
trajectories, so the DEFAULT lane forces x64 on a CPU mesh (8 virtual
devices to exercise the sharding paths without TPU hardware).

TPU production runs use float32, and the driver's multi-chip dry run
executes under default-f32 -- a precision the x64 lane never touches
(round 2 shipped a red driver artifact that 356 x64-green tests missed).
Setting ``RRMPG_TEST_DTYPE=float32`` switches the suite to the
production dtype; tests whose assertions genuinely need float64 (tight
golden tolerances, bit-parity oracles) carry ``@pytest.mark.f64only``
and are skipped in that lane.  CI runs both lanes.
"""

import os

import pytest

# Must be set before the first jax backend initialization.
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

TEST_DTYPE = os.environ.get("RRMPG_TEST_DTYPE", "float64")
if TEST_DTYPE not in ("float32", "float64"):
    raise ValueError(
        f"RRMPG_TEST_DTYPE={TEST_DTYPE!r}; expected float32 or float64.")

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", TEST_DTYPE == "float64")

# Persistent XLA compilation cache: repeat suite runs skip most
# compiles (the wall-clock is compile-dominated), and fewer in-process
# compilations also reduce exposure to a sporadic XLA-CPU compiler
# crash observed deep into ~300-test single-process runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


def pytest_collection_modifyitems(config, items):
    if TEST_DTYPE == "float64":
        return
    skip_f64 = pytest.mark.skip(
        reason="needs float64 (golden-parity tolerance); "
               "RRMPG_TEST_DTYPE=float32 lane")
    for item in items:
        if "f64only" in item.keywords:
            item.add_marker(skip_f64)
