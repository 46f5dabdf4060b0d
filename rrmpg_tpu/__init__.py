# This file is part of rrmpg-tpu, a TPU-native rainfall-runoff modeling
# framework (JAX / XLA / Pallas / pjit).
#
# rrmpg-tpu provides the full capability surface of the reference RRMPG
# package (conceptual hydrological models, Monte-Carlo ensembles, global
# calibration, evaluation metrics, CAMELS toy data), re-designed TPU-first:
# the per-timestep storage-update recurrences are `jax.lax.scan` /
# `jax.lax.associative_scan` kernels, parameter ensembles and catchments are
# batch axes handled by `jax.vmap`, and large ensembles shard over a
# `jax.sharding.Mesh` with GSPMD-compiled collectives.
#
# Licensed under the MIT License.

__version__ = "0.5.0"
__author__ = "rrmpg-tpu developers"

from . import data
from . import models
from . import ops
from . import parallel
from . import tools
from . import utils
