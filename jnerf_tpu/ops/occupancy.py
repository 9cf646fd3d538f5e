"""Cascaded occupancy grid: lookups and the periodic density-grid update.

Reimplements the reference's grid machinery
(`/root/reference/python/jnerf/models/samplers/density_grid_sampler/op_header/`:
``ray_sampler_header.h`` mip/occupancy helpers :58-95, :826-871;
``mark_untrained_density_grid.h``; ``generate_grid_samples_nerf_nonuniform.h``;
``splat_grid_samples_nerf_max_nearest_neighbor.h``; ``ema_grid_samples_nerf.h``;
``update_bitfield.h``) as batched XLA programs:

- the CUDA per-thread hash-probe / atomicMax-splat loops become vectorized
  gathers and deterministic ``.at[].max()`` scatters;
- the morton-indexed bitfield becomes a dense ``[C, G, G, G]`` bool array
  (linear layout — morton order only served GPU memory locality);
- the cascade max-pool writes the 2x-downsampled finer level into the center
  octant ``[G/4, 3G/4)`` of the next level, exactly like
  ``bitfield_max_pool`` (`update_bitfield.h:47-69`);
- positions flow through as separate x/y/z component arrays (SoA): TPU
  vector tiling pads a trailing size-3 axis to 128 lanes, so ``[N, 3]``
  arrays at N in the millions would waste ~42x HBM.

All functions are pure and jittable; grid state is a small pytree.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp

SQRT3 = math.sqrt(3.0)


@dataclass(frozen=True)
class GridConfig:
    grid_size: int = 128
    n_cascades: int = 5
    max_cascade: int = 0  # highest cascade actually used (aabb_scale dependent)
    aabb_min: float = -1.5
    aabb_max: float = 2.5
    min_optical_thickness: float = 0.01
    decay: float = 0.95
    max_steps: int = 1024  # NERF_STEPS()

    @property
    def stepsize(self) -> float:
        # STEPSIZE() == MIN_CONE_STEPSIZE() (`density_grid_sampler.py:103-104`)
        return SQRT3 / self.max_steps

    @property
    def max_cone_stepsize(self) -> float:
        return (
            self.stepsize
            * (1 << (self.n_cascades - 1))
            * self.max_steps
            / self.grid_size
        )

    @property
    def n_cells(self) -> int:
        return self.grid_size ** 3

    @property
    def aabb_diag(self) -> float:
        return self.aabb_max - self.aabb_min


def make_grid_config(aabb_range, grid_size=128, max_steps=1024):
    """Derive cascade counts from the dataset aabb, like
    `density_grid_sampler.py:56-64`.  grid_size/max_steps below the
    reference's 128/1024 are supported for small-scale tests."""
    aabb_min, aabb_max = aabb_range
    aabb_scale = aabb_max - aabb_min
    n_cascades = 5
    if aabb_scale > (1 << (n_cascades - 1)):
        n_cascades = int(math.ceil(math.log2(aabb_scale))) + 1
    max_cascade = 0
    while (1 << max_cascade) < aabb_scale:
        max_cascade += 1
    return GridConfig(
        grid_size=int(grid_size),
        n_cascades=n_cascades,
        max_cascade=max_cascade,
        aabb_min=float(aabb_min),
        aabb_max=float(aabb_max),
        max_steps=int(max_steps),
    )


# --------------------------------------------------------------------- mips
def _exp_of(x):
    """frexp-style exponent: e with x = m * 2^e, m in [0.5, 1)."""
    return jnp.floor(jnp.log2(jnp.maximum(x, 1e-10))).astype(jnp.int32) + 1


def mip_from_pos_xyz(px, py, pz, cfg: GridConfig):
    """Finest cascade containing the position — `ray_sampler_header.h:58-65`."""
    maxval = jnp.maximum(
        jnp.abs(px - 0.5), jnp.maximum(jnp.abs(py - 0.5), jnp.abs(pz - 0.5))
    )
    return jnp.clip(_exp_of(maxval) + 1, 0, cfg.n_cascades - 1)


def mip_from_dt_xyz(dt, px, py, pz, cfg: GridConfig):
    """Cascade from step size and position — `ray_sampler_header.h:67-77`."""
    mip = mip_from_pos_xyz(px, py, pz, cfg)
    d = dt * (2 * cfg.grid_size)
    return jnp.where(
        d < 1.0, mip, jnp.clip(jnp.maximum(_exp_of(d), mip), 0, cfg.n_cascades - 1)
    )


def occupancy_at_xyz(bitfield, px, py, pz, mip, cfg: GridConfig):
    """bitfield: [C, G, G, G] bool; p*: [...] components -> bool [...].

    `cascaded_grid_idx_at` + `density_grid_occupied_at`
    (`ray_sampler_header.h:826-848`).
    """
    g = cfg.grid_size
    mip_scale = jnp.exp2(-mip.astype(jnp.float32))

    def cell(p):
        q = (p - 0.5) * mip_scale + 0.5
        return jnp.clip(jnp.floor(q * g).astype(jnp.int32), 0, g - 1)

    ix, iy, iz = cell(px), cell(py), cell(pz)
    # Row-gather the z-line and mask-reduce the lane: element gathers run
    # ~2.4x slower than row gathers on TPU (tools/probe_march.py), and
    # take_along_axis on [N, 128] lowers catastrophically — a lane-mask
    # max fuses into the gather consumer instead.
    shp = ix.shape
    rows = jnp.take(
        bitfield.reshape(-1, g), ((mip * g + ix) * g + iy).reshape(-1), axis=0
    )  # [N, G] bool
    lane = jnp.arange(g, dtype=jnp.int32)[None, :]
    hit = jnp.max(
        rows & (lane == iz.reshape(-1, 1)), axis=1
    )
    return hit.reshape(shp)


# ------------------------------------------------------------- grid updates
def _cell_centers_xyz(cfg: GridConfig):
    """([G^3], [G^3], [G^3]) cell-index components, x-major flat order."""
    g = cfg.grid_size
    lin = jnp.arange(cfg.n_cells, dtype=jnp.int32)
    x = lin // (g * g)
    y = (lin // g) % g
    z = lin % g
    return x, y, z


def mark_untrained_grid(poses, focal_lengths, resolution, cfg: GridConfig):
    """-1 for cells seen by zero training cameras, else 0.

    Vectorized `mark_untrained_density_grid.h:12-47`: project each cell
    center into every camera frustum with voxel-radius slack; scan over
    images keeps peak memory at a few [C*G^3] 1-D masks.
    Returns [C, G, G, G] float32.
    """
    g = cfg.grid_size
    W, H = resolution
    xs, ys, zs = _cell_centers_xyz(cfg)

    def center(comp, level):
        return ((comp.astype(jnp.float32) + 0.5) / g - 0.5) * (2.0 ** level) + 0.5

    cx = jnp.concatenate([center(xs, l) for l in range(cfg.n_cascades)])
    cy = jnp.concatenate([center(ys, l) for l in range(cfg.n_cascades)])
    cz = jnp.concatenate([center(zs, l) for l in range(cfg.n_cascades)])
    radii = jnp.concatenate(
        [
            jnp.full((cfg.n_cells,), 0.5 * SQRT3 * (2.0 ** l) / g)
            for l in range(cfg.n_cascades)
        ]
    )

    def body(j, seen):
        xform = poses[j]  # [3, 4]
        lx = cx - xform[0, 3]
        ly = cy - xform[1, 3]
        lz = cz - xform[2, 3]
        # dot with camera basis columns
        x = lx * xform[0, 0] + ly * xform[1, 0] + lz * xform[2, 0]
        y = lx * xform[0, 1] + ly * xform[1, 1] + lz * xform[2, 1]
        z = lx * xform[0, 2] + ly * xform[1, 2] + lz * xform[2, 2]
        fx, fy = focal_lengths[j, 0], focal_lengths[j, 1]
        vis = (
            (z > 0)
            & (jnp.abs(x) - radii < z / fx * (0.5 * W))
            & (jnp.abs(y) - radii < z / fy * (0.5 * H))
        )
        return seen | vis

    seen = jax.lax.fori_loop(0, poses.shape[0], body, jnp.zeros(cx.shape[0], bool))
    grid = jnp.where(seen, 0.0, -1.0)
    return grid.reshape(cfg.n_cascades, g, g, g)


def generate_grid_samples(key, grid, step, n_samples, thresh, cfg: GridConfig):
    """Pick n_samples cells + jittered positions inside them.

    Faithful to `generate_grid_samples_nerf_nonuniform.h:10-35`: a random
    cascade in [0, max_cascade], then up to 10 tries of the deterministic
    hash probe for a cell with density > thresh (falling back to the last
    probe), then a uniform jitter inside the cell.  The reference interprets
    probe values as morton codes; we interpret them in our linear layout —
    an equally uniform cell distribution.

    Returns (indices [n] int32 flat into [C*G^3], (x, y, z) [n] world
    position components).
    """
    g = cfg.grid_size
    n_cascades = cfg.max_cascade + 1
    k_level, kx, ky, kz = jax.random.split(key, 4)
    level = jax.random.randint(k_level, (n_samples,), 0, n_cascades)

    i = jnp.arange(n_samples, dtype=jnp.uint32)
    j = jnp.arange(10, dtype=jnp.uint32)
    probe = (
        (i[:, None] + jnp.uint32(step) * jnp.uint32(n_samples)) * jnp.uint32(56924617)
        + j[None, :] * jnp.uint32(19349663)
        + jnp.uint32(96925573)
    ) % jnp.uint32(cfg.n_cells)
    idx_cand = probe.astype(jnp.int32) + level[:, None] * cfg.n_cells  # [n, 10]
    ok = jnp.take(grid.reshape(-1), idx_cand) > thresh
    # First passing probe, else the last one (j=9), matching the CUDA loop.
    first = jnp.argmax(ok, axis=1)
    pick = jnp.where(jnp.any(ok, axis=1), first, 9)
    idx = jnp.take_along_axis(idx_cand, pick[:, None], axis=1)[:, 0]

    pos_idx = idx % cfg.n_cells
    mip_scale = jnp.exp2(level.astype(jnp.float32))

    def world(comp, k):
        u = jax.random.uniform(k, (n_samples,))
        return ((comp.astype(jnp.float32) + u) / g - 0.5) * mip_scale + 0.5

    x = world(pos_idx // (g * g), kx)
    y = world((pos_idx // g) % g, ky)
    z = world(pos_idx % g, kz)
    return idx, (x, y, z)


def splat_density(indices, raw_density, grid_tmp, cfg: GridConfig):
    """Max-splat exp-activated densities scaled by the min step size.

    `splat_grid_samples_nerf_max_nearest_neighbor.h:5-23`; atomicMax becomes
    a deterministic scatter-max.
    """
    from jnerf_tpu.ops.composite import network_to_density

    thickness = network_to_density(raw_density.reshape(-1)) * cfg.stepsize
    flat = grid_tmp.reshape(-1).at[indices].max(thickness)
    return flat.reshape(grid_tmp.shape)


def ema_grid_update(grid, grid_tmp, cfg: GridConfig):
    """Decay-max update preserving -1 "untrained" cells
    (`ema_grid_samples_nerf.h:23-25`)."""
    return jnp.where(grid < 0, grid, jnp.maximum(grid * cfg.decay, grid_tmp))


def density_grid_mean(grid, cfg: GridConfig):
    """Mean of ReLU'd cascade-0 densities (`update_bitfield.py:27-30`)."""
    return jnp.mean(jax.nn.relu(grid[0]))


def update_bitfield(grid, mean, cfg: GridConfig, pool_hi=None):
    """Threshold the grid into the occupancy bitfield + cascade max-pool.

    `update_bitfield.h:23-69`: bit = density > min(0.01, mean); then each
    coarser cascade's center octant ORs in the 2x max-pool of the finer one.
    Returns [C, G, G, G] bool.

    pool_hi bounds the pooling chain to the cascades the march can
    actually probe: under const-dt marching mip_from_pos caps at
    max_cascade (+1 at the cascade boundary) and the dt-based bump
    (`ray_sampler_header.h:67-77`) never fires (d < 1), so pooling the
    remaining cascades writes bits no lookup reads (measured 11.3 ms per
    refresh at bench scale for the full 5-cascade chain).  None = full
    chain (required for cone-angle marching, whose dt growth can probe
    any cascade).
    """
    g = cfg.grid_size
    thresh = jnp.minimum(cfg.min_optical_thickness, mean)
    bits = grid > thresh  # [C, G, G, G]

    if pool_hi is None:
        pool_hi = cfg.n_cascades - 1

    q = g // 4
    levels = [bits[0]]
    for level in range(1, cfg.n_cascades):
        cur = bits[level]
        if level <= pool_hi:
            prev = levels[-1]
            pooled = prev.reshape(
                g // 2, 2, g // 2, 2, g // 2, 2
            ).any(axis=(1, 3, 5))
            center = cur[q : 3 * q, q : 3 * q, q : 3 * q] | pooled
            cur = cur.at[q : 3 * q, q : 3 * q, q : 3 * q].set(center)
        levels.append(cur)
    return jnp.stack(levels, axis=0)
