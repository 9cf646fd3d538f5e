"""Multiresolution hash-grid encoding (tcnn-style) as pure JAX.

Reimplements the semantics of the reference CUDA kernels
(`/root/reference/python/jnerf/models/position_encoders/hash_encoder/op_header/HashEncode.h`:
``grid_index`` :74-95, ``pos_fract`` :109-117, ``kernel_grid`` :119-253,
``kernel_grid_backward`` :301-396) TPU-first:

- the forward is one vectorized 8-corner gather + trilinear blend over all
  levels at once (one fused XLA program, MXU-free, bandwidth-bound);
- the backward falls out of JAX autodiff as a deterministic scatter-add
  (the CUDA version races atomicAdds; XLA's scatter is deterministic —
  a reproducibility improvement, noted in SURVEY.md §5.2).

Table layout matches the reference: one flat parameter array with per-level
offsets; levels whose dense size ``resolution**3`` exceeds ``2**log2_hashmap_size``
are hash-indexed, coarser levels are dense-indexed.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_HASH_FUNC = "p0 ^ p1 * 19349663 ^ p2 * 83492791"


def _compile_hash_func(expr: str):
    """Turn the config's C hash expression into a jnp uint32 function.

    The reference injects the string into CUDA source
    (`hash_encoder.py:14-16`); here Python's operator precedence for
    ``^``/``*``/``+`` matches C's, and uint32 numpy arithmetic wraps mod 2^32,
    so evaluating the same expression over uint32 arrays is semantically
    identical.
    """
    code = compile(expr, "<hash_func>", "eval")

    def fn(p0, p1, p2):
        env = {
            "p0": p0.astype(jnp.uint32),
            "p1": p1.astype(jnp.uint32),
            "p2": p2.astype(jnp.uint32),
        }
        return eval(code, {"__builtins__": {}}, env)

    return fn


@dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of the hash grid (all host-side constants)."""

    n_levels: int = 16
    n_features_per_level: int = 2
    base_resolution: int = 16
    log2_hashmap_size: int = 19
    aabb_scale: float = 1.0
    desired_resolution: float = 2048.0
    hash_func: str = DEFAULT_HASH_FUNC
    # Derived (filled in __post_init__):
    per_level_scale: float = field(init=False, default=0.0)
    scales: Tuple[float, ...] = field(init=False, default=())
    resolutions: Tuple[int, ...] = field(init=False, default=())
    level_sizes: Tuple[int, ...] = field(init=False, default=())
    level_offsets: Tuple[int, ...] = field(init=False, default=())
    n_entries: int = field(init=False, default=0)

    def __post_init__(self):
        # Geometry progression mirrors `grid_encode.py:17-35`.
        pls = math.exp(
            math.log(self.desired_resolution * self.aabb_scale / self.base_resolution)
            / max(self.n_levels - 1, 1)
        )
        scales, resolutions, sizes, offsets = [], [], [], [0]
        max_entries = 1 << self.log2_hashmap_size
        for lvl in range(self.n_levels):
            scale = 2.0 ** (lvl * math.log2(pls)) * self.base_resolution - 1.0
            res = int(math.ceil(scale)) + 1
            dense = res ** 3
            size = min(-(-dense // 8) * 8, max_entries)  # 8-aligned, capped
            scales.append(scale)
            resolutions.append(res)
            sizes.append(size)
            offsets.append(offsets[-1] + size)
        object.__setattr__(self, "per_level_scale", pls)
        object.__setattr__(self, "scales", tuple(scales))
        object.__setattr__(self, "resolutions", tuple(resolutions))
        object.__setattr__(self, "level_sizes", tuple(sizes))
        object.__setattr__(self, "level_offsets", tuple(offsets))
        object.__setattr__(self, "n_entries", offsets[-1])

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def init_table(self, key, dtype=jnp.float32):
        """Uniform +-1e-4 init, like `hash_encoder.py:24-25`."""
        return jax.random.uniform(
            key, (self.n_entries, self.n_features_per_level), dtype,
            minval=-1e-4, maxval=1e-4,
        )


def hash_grid_indices(spec: HashGridSpec, pos: jnp.ndarray):
    """Corner table indices + trilinear weights for positions.

    Args:
      pos: [N, 3] float32 in [0, 1] (warped coordinates).
    Returns:
      idx: [N, L, 8] int32 indices into the flat table.
      weights: [N, L, 8] float32 trilinear weights.
    """
    hash_fn = _compile_hash_func(spec.hash_func)
    scales = jnp.asarray(spec.scales, jnp.float32)  # [L]
    res = jnp.asarray(spec.resolutions, jnp.uint32)  # [L]
    sizes = jnp.asarray(spec.level_sizes, jnp.uint32)
    offsets = jnp.asarray(spec.level_offsets[:-1], jnp.uint32)
    # Whether each level is dense-indexed is a static property; compute on host
    # to avoid 32-bit overflow of res**3 on device.
    dense = jnp.asarray(
        np.array(
            [r ** 3 <= s for r, s in zip(spec.resolutions, spec.level_sizes)], bool
        )
    )  # [L]

    # pos_fract (`HashEncode.h:109-117`): p = x*scale + 0.5
    p = pos[:, None, :] * scales[None, :, None] + 0.5  # [N, L, 3]
    g0 = jnp.floor(p)
    frac = p - g0
    g0 = g0.astype(jnp.uint32)

    # 8 corners, bit c of corner index selects +1 along dim c.
    corners = jnp.asarray(
        [[(c >> d) & 1 for d in range(3)] for c in range(8)], jnp.uint32
    )  # [8, 3]
    pg = g0[:, :, None, :] + corners[None, None, :, :]  # [N, L, 8, 3]

    px, py, pz = pg[..., 0], pg[..., 1], pg[..., 2]
    r = res[None, :, None]
    idx_dense = px + py * r + pz * r * r
    idx_hash = hash_fn(px, py, pz)
    idx = jnp.where(dense[None, :, None], idx_dense, idx_hash)
    idx = idx % sizes[None, :, None] + offsets[None, :, None]

    w = jnp.where(corners[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
    weights = w[..., 0] * w[..., 1] * w[..., 2]  # [N, L, 8]
    return idx.astype(jnp.int32), weights


def hash_encode(spec: HashGridSpec, table: jnp.ndarray, pos: jnp.ndarray, compute_dtype=None):
    """Encode positions: [N,3] -> [N, L*F], level-major feature order.

    Differentiable in ``table`` (autodiff backward = deterministic
    scatter-add, the TPU replacement for `kernel_grid_backward`'s atomicAdd).
    Like the reference (`grid_encode.py:190` returns None for d/dpos), the
    position input is treated as non-differentiable.
    """
    pos = jax.lax.stop_gradient(pos)
    idx, weights = hash_grid_indices(spec, pos)
    gathered = jnp.take(table, idx, axis=0)  # [N, L, 8, F]
    if compute_dtype is not None:
        gathered = gathered.astype(compute_dtype)
        weights = weights.astype(compute_dtype)
    out = jnp.sum(gathered * weights[..., None], axis=2)  # [N, L, F]
    return out.reshape(pos.shape[0], spec.out_dim)
