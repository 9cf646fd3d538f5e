"""jnerf_tpu: a TPU-native NeRF framework (JAX/XLA/Pallas) with the
capabilities of Jittor/JNeRF.  See SURVEY.md for the reference analysis."""

__version__ = "0.1.0"

import os as _os

# Persistent compilation cache: NGP train-step compiles run minutes on TPU
# (and recompile per ray-batch shape); caching them across processes makes
# every run after the first start instantly.  Opt out with
# JNERF_TPU_NO_COMPILE_CACHE=1.
if (
    not _os.environ.get("JNERF_TPU_NO_COMPILE_CACHE")
    # CPU AOT cache entries are machine-feature-sensitive (loading them on a
    # different host miscompiles); cache only accelerator backends.
    and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")
):
    import jax as _jax

    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "jnerf_tpu_xla"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

from jnerf_tpu.utils.config import get_cfg, init_cfg, save_cfg, update_cfg  # noqa: F401
from jnerf_tpu.utils.registry import (  # noqa: F401
    DATASETS, ENCODERS, LOSSES, NETWORKS, OPTIMS, SAMPLERS, SCHEDULERS,
    build_from_cfg,
)

# Importing subpackages registers all built-in components.
from jnerf_tpu import dataset, models, optims  # noqa: F401
