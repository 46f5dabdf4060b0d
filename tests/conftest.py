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
