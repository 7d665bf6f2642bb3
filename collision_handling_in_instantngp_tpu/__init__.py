"""collision_handling_in_instantngp_tpu — TPU-native GNGF / InstantNGP framework.

A brand-new JAX/XLA/Pallas implementation of the capabilities of the reference
repo FedeMont/collision_handling_in_instantNGP: multi-resolution hash encoding
fitting 2D images, with a learned General Neural Gauge Field (HashProbDistribution
+ straight-through differentiable top-k) replacing the spatial hash, JS/KL
slot-uniformity and collision-penalty losses, grid-search driver, and TPU-mesh
data parallelism.
"""

from .config import (
    ExperimentConfig,
    GRID_SEARCH_AXES,
    HiddenActivation,
    LossConfig,
    ModelConfig,
    OptimizerConfig,
    TopkBlendMode,
    TopkScatterMode,
    TrainConfig,
    experiment_from_grid_id,
    get_grid_search_configs,
)

__version__ = "0.1.0"

__all__ = [
    "ExperimentConfig",
    "GRID_SEARCH_AXES",
    "HiddenActivation",
    "LossConfig",
    "ModelConfig",
    "OptimizerConfig",
    "TopkBlendMode",
    "TopkScatterMode",
    "TrainConfig",
    "experiment_from_grid_id",
    "get_grid_search_configs",
    "__version__",
]
