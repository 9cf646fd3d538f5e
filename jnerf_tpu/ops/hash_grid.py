"""Multiresolution hash-grid encoding (tcnn-style) as pure JAX, laid out
for TPU memory tiling.

Reimplements the semantics of the reference CUDA kernels
(`/root/reference/python/jnerf/models/position_encoders/hash_encoder/op_header/HashEncode.h`:
``grid_index`` :74-95, ``pos_fract`` :109-117, ``kernel_grid`` :119-253,
``kernel_grid_backward`` :301-396) TPU-first:

- TPU vector memory tiles are (8, 128): any array whose minor dimension is
  tiny (e.g. ``[N, L, 8, 3]`` corner coordinates) pads its last dim to 128
  lanes — a 16-42x memory blowup that OOMs HBM at NGP scale.  So all hot
  intermediates here are ``[N, L*8]`` — for the standard 16 levels x 8
  corners that is exactly 128 lanes per sample — and the xyz components are
  separate arrays instead of a trailing size-3 axis.
- The table is gathered per-feature (SoA) so gather results are ``[N, L*8]``
  too, never ``[..., F]`` with F=2 in the minor dim.
- The backward falls out of JAX autodiff as a deterministic scatter-add
  (the CUDA version races atomicAdds; XLA's scatter is deterministic — a
  reproducibility improvement, SURVEY.md §5.2).

Table layout matches the reference: one flat parameter array with per-level
offsets; levels whose dense size ``resolution**3`` exceeds
``2**log2_hashmap_size`` are hash-indexed, coarser levels dense-indexed.
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
    (`hash_encoder.py:14-16`); Python's precedence for ``^``/``*``/``+``
    matches C's and uint32 numpy arithmetic wraps mod 2^32, so evaluating
    the same expression over uint32 arrays is semantically identical.
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
    # Extra cap on hashed-level table size (entries), on top of
    # 2**log2_hashmap_size.  The TPU linear-hash paths set this to 2^18:
    # XLA row gathers run 3.5x faster when the operand is <= ~14 MB
    # (measured cliff, tools/probe_gather.py), and a pow2 size turns the
    # per-level `% size` into a bitwise AND.  None = reference sizes.
    max_level_size: int | None = None
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
        if self.max_level_size is not None:
            max_entries = min(max_entries, self.max_level_size)
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

    @property
    def lanes(self) -> int:
        """Corners axis width: L * 8 (== 128 for the standard 16 levels)."""
        return self.n_levels * 8

    def init_table(self, key, dtype=jnp.float32):
        """Uniform +-1e-4 init, like `hash_encoder.py:24-25`."""
        return jax.random.uniform(
            key, (self.n_entries, self.n_features_per_level), dtype,
            minval=-1e-4, maxval=1e-4,
        )

    # ---- per-(level, corner) constant rows, shape [L*8], corner-major in 8s
    def _lane_const(self, per_level, dtype):
        return jnp.asarray(np.repeat(np.asarray(per_level, dtype), 8))

    def lane_tables(self):
        """Static [L*8] lane constants used by the index computation."""
        corners = np.array(
            [[(c >> d) & 1 for c in range(8)] for d in range(3)], np.uint32
        )  # [3, 8]
        lanes = {
            "scale": self._lane_const(self.scales, np.float32),
            "res": self._lane_const(self.resolutions, np.uint32),
            "size": self._lane_const(self.level_sizes, np.uint32),
            "offset": self._lane_const(self.level_offsets[:-1], np.uint32),
            "dense": self._lane_const(
                [r ** 3 <= s for r, s in zip(self.resolutions, self.level_sizes)],
                bool,
            ),
            "corner": [
                jnp.asarray(np.tile(corners[d], self.n_levels)) for d in range(3)
            ],
        }
        return lanes


def hash_grid_indices(spec: HashGridSpec, pos: jnp.ndarray):
    """Corner table indices + trilinear weights, [N, L*8]-shaped.

    Args:
      pos: [N, 3] float32 in [0, 1] (warped coordinates).
    Returns:
      idx: [N, L*8] int32 indices into the flat table (level-major, 8
        corners per level).
      weights: [N, L*8] float32 trilinear weights (sum to 1 per level).
    """
    hash_fn = _compile_hash_func(spec.hash_func)
    lanes = spec.lane_tables()
    scale = lanes["scale"][None, :]  # [1, L*8]

    pg = []
    w = None
    for d in range(3):
        # pos_fract (`HashEncode.h:109-117`): p = x*scale + 0.5
        p = pos[:, d, None] * scale + 0.5  # [N, L*8]
        g0 = jnp.floor(p)
        frac = p - g0
        corner = lanes["corner"][d][None, :]
        pg.append(g0.astype(jnp.uint32) + corner)
        wd = jnp.where(corner == 1, frac, 1.0 - frac)
        w = wd if w is None else w * wd

    res = lanes["res"][None, :]
    idx_dense = pg[0] + pg[1] * res + pg[2] * res * res
    idx_hash = hash_fn(pg[0], pg[1], pg[2])
    idx = jnp.where(lanes["dense"][None, :], idx_dense, idx_hash)
    idx = idx % lanes["size"][None, :] + lanes["offset"][None, :]
    return idx.astype(jnp.int32), w


def hash_encode(spec: HashGridSpec, table: jnp.ndarray, pos: jnp.ndarray,
                compute_dtype=None):
    """Encode positions: [N,3] -> [N, L*F], level-major feature order.

    Differentiable in ``table`` (autodiff backward = deterministic
    scatter-add, the TPU replacement for `kernel_grid_backward`'s
    atomicAdd).  Like the reference (`grid_encode.py:190` returns None for
    d/dpos), the position input is treated as non-differentiable.
    """
    pos = jax.lax.stop_gradient(pos)
    n = pos.shape[0]
    L, F = spec.n_levels, spec.n_features_per_level
    idx, weights = hash_grid_indices(spec, pos)  # [N, L*8]
    if compute_dtype is not None:
        weights = weights.astype(compute_dtype)
    feats = []
    for f in range(F):
        col = table[:, f]  # [n_entries]
        if compute_dtype is not None:
            col = col.astype(compute_dtype)
        g = jnp.take(col, idx, axis=0)  # [N, L*8]
        lv = (g * weights).reshape(n, L, 8).sum(axis=-1)  # [N, L]
        feats.append(lv)
    # Feature-major output [f0 levels..., f1 levels...] — a fixed permutation
    # of the reference's level-major interleave, absorbed by the first MLP
    # layer (self-consistent; avoids materializing an [N, L, F] minor-dim-2
    # array, which TPU tiling would pad 64x).
    return jnp.concatenate(feats, axis=-1)
