"""Test configuration: CPU backend, float64, 8 virtual devices.

Golden-data validation runs against the reference's float64 Excel/MATLAB
trajectories, so tests force x64 on a CPU mesh (8 virtual devices to
exercise the sharding paths without TPU hardware).  TPU production runs use
float32 -- drift between the two is quantified in test_precision.py.
"""

import os

# Must be set before the first jax backend initialization.
os.environ.setdefault("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: repeat suite runs skip most
# compiles (the wall-clock is compile-dominated), and fewer in-process
# compilations also reduce exposure to a sporadic XLA-CPU compiler
# crash observed deep into ~300-test single-process runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
