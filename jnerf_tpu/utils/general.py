"""General utilities (seeding, checkpoint discovery, file checks).

Parity target: `/root/reference/python/jnerf/utils/general.py`.  The MPI
all-reduce hook there is dead code; our cross-device story lives in
``jnerf_tpu.parallel`` instead.
"""

from __future__ import annotations

import os
import random
import re

import numpy as np


def check_file(path: str, ext=None) -> bool:
    if not path or not os.path.isfile(path):
        return False
    if ext is not None and os.path.splitext(path)[1] not in ext:
        return False
    return True


def check_dir(path: str, make: bool = False) -> bool:
    if os.path.isdir(path):
        return True
    if make:
        os.makedirs(path, exist_ok=True)
        return True
    return False


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs. Device randomness uses explicit jax.random keys."""
    random.seed(seed)
    np.random.seed(seed)


def search_ckpt(ckpt_dir: str, prefix: str = "ckpt_", suffix: str = ".pkl"):
    """Find the latest checkpoint file ``{prefix}{iter:06d}{suffix}`` in a dir.

    Mirrors NeuS auto-resume (`neus_runner.py:64-75`, `general.py:157-162`).
    Returns the filename (not full path) or None.
    """
    if not os.path.isdir(ckpt_dir):
        return None
    best, best_iter = None, -1
    pat = re.compile(re.escape(prefix) + r"(\d+)" + re.escape(suffix) + r"$")
    for name in os.listdir(ckpt_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_iter:
            best_iter, best = int(m.group(1)), name
    return best


def sync(data, reduce_mode="mean", axis_name=None):
    """Cross-device reduction of a metric value.

    Parity target: `/root/reference/python/jnerf/utils/general.py:29-47` —
    there it wraps Jittor's (never-exercised) `mpi_all_reduce`.  Here:
    inside a shard_map/pmap region pass ``axis_name`` to psum/pmean over the
    mesh; outside one, values are already globally consistent (jit with
    sharding keeps replicated outputs in sync), so it is the identity.
    """
    import jax
    import jax.numpy as jnp

    if isinstance(data, (int, float)):
        return data
    data = jnp.asarray(data)
    if axis_name is not None:
        if reduce_mode == "mean":
            return jax.lax.pmean(data, axis_name)
        return jax.lax.psum(data, axis_name)
    return data
