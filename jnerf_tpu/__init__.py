"""jnerf_tpu: a TPU-native NeRF framework (JAX/XLA/Pallas) with the
capabilities of Jittor/JNeRF.  See SURVEY.md for the reference analysis."""

__version__ = "0.1.0"

from jnerf_tpu.utils.config import get_cfg, init_cfg, save_cfg, update_cfg  # noqa: F401
from jnerf_tpu.utils.registry import (  # noqa: F401
    DATASETS, ENCODERS, LOSSES, NETWORKS, OPTIMS, SAMPLERS, SCHEDULERS,
    build_from_cfg,
)

# Importing subpackages registers all built-in components.
from jnerf_tpu import dataset, models, optims  # noqa: F401
