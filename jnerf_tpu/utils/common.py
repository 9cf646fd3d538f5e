"""Small shared helpers (parity: `/root/reference/python/jnerf/utils/common.py`)."""

from __future__ import annotations

import numpy as np


def enlarge(arr, size: int):
    """Grow a 1-D buffer to at least `size` (reference grows jt.Vars in
    place; functionally we return the padded array)."""
    if arr.shape[0] >= size:
        return arr
    import jax.numpy as jnp

    pad = jnp.zeros((size - arr.shape[0],) + arr.shape[1:], arr.dtype)
    return jnp.concatenate([arr, pad], axis=0)


class BoundingBox:
    """Host-side axis-aligned box."""

    def __init__(self, min_point=(0.0, 0.0, 0.0), max_point=(1.0, 1.0, 1.0)):
        self.min = np.asarray(min_point, np.float32)
        self.max = np.asarray(max_point, np.float32)

    def contains(self, p) -> bool:
        p = np.asarray(p)
        return bool(np.all(p >= self.min) and np.all(p <= self.max))

    def diag(self):
        return self.max - self.min

    def relative_pos(self, p):
        return (np.asarray(p) - self.min) / self.diag()
