"""Multi-device scaling: SPMD data parallelism over a jax.sharding.Mesh.

The reference has no exercised distributed path (its only hook is an unused
MPI all-reduce, `/root/reference/python/jnerf/utils/general.py:39-41`,
SURVEY.md §2.5/§5.8).  Here scaling is first-class and TPU-native:

- a 1-D ``data`` mesh shards the *ray batch*; model/hash-grid params stay
  replicated (they are ~50 MB — far below the per-chip HBM where ICI
  all-reduce of gradients is the right trade);
- sharding is expressed with ``NamedSharding`` constraints inside one jitted
  train step; XLA inserts the gradient ``psum`` over ICI automatically when
  the mean-loss reduction crosses the sharded axis (the scaling-book recipe:
  annotate, compile, let the compiler place collectives);
- the same code path runs unchanged on a single chip (mesh of size 1) up to
  a pod slice.

Never shard the per-ray *sample* axis — rays are independent, samples along
a ray are a sequential compositing chain (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """A 1-D data-parallel mesh over the first n (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def shard_rays(x, mesh: Optional[Mesh]):
    """Constrain a [R, ...] array to be sharded over the ray axis."""
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(DATA_AXIS, *([None] * (x.ndim - 1))))
    )


def replicated(x, mesh: Optional[Mesh]):
    if mesh is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P()))


def replicate_tree(tree, mesh: Optional[Mesh]):
    """Place a pytree fully-replicated on the mesh (host -> devices)."""
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
