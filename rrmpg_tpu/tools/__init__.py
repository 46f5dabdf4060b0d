"""Experiment drivers: Monte-Carlo ensembles and global calibration."""

from .calibration import (
    OptimizeResult,
    differential_evolution,
    gradient_descent,
    minimize,
    random_search,
)
from .sce import sce_ua
from .assimilation import (
    assimilation_cycle,
    enkf_update,
    particle_filter_update,
    perturb_state,
)
from .checkpoint import (
    load_checkpoint,
    load_state,
    save_checkpoint,
    save_state,
)
from .mcmc import MCMCResult, demc_sample
from .monte_carlo import monte_carlo
from .moo import ParetoResult, hypervolume_2d, nsga2
from .sensitivity import (
    MorrisResult,
    SobolResult,
    morris_screening,
    sobol_indices,
)
from .uncertainty import glue_weights, prediction_limits
