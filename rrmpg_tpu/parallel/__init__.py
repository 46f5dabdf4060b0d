"""Device-mesh sharding for ensembles and regional (multi-catchment) runs."""

from .distributed import initialize
from .ensemble import ensemble_objective, ensemble_run
from .regional import (
    regional_gr4j_objective,
    regional_run,
    regional_snow_objective,
)
from .mesh import (
    CATCHMENT_AXIS,
    ENSEMBLE_AXIS,
    default_mesh,
    ensemble_catchment_mesh,
    pad_to_multiple,
    replicate,
    shard_leading_axis,
)
