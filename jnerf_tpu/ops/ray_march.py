"""Occupancy-guided ray sampling as fixed-budget candidate selection.

This is the TPU-first re-design of the reference's adaptive two-pass CUDA
ray marcher (`/root/reference/python/jnerf/models/samplers/density_grid_sampler/op_header/ray_sampler.h:4-114`)
and transmittance compaction (`compacted_coord.h`), whose atomic counters and
host-side truncation force dynamic shapes that XLA cannot compile.

Design:

1. Every ray gets a *static* set of K candidate step positions along
   [max(tmin, near), tmax], using the exact step-size policy of the
   reference (`calc_dt`: constant ``STEPSIZE/2`` when ``const_dt`` else
   ``clamp(t * cone_angle, dt_min, dt_max)``) with the same per-ray jittered
   start.  The non-constant policy's sequential recurrence
   ``t_{k+1} = t_k + calc_dt(t_k)`` has a closed form (linear, then
   geometric, then linear phases) so no sequential scan is needed.
2. One vectorized occupancy-bitfield gather classifies all R*K candidates.
3. Each ray keeps its first S occupied candidates ("first" = front-to-back,
   exactly the samples the reference's marcher would take; DDA voxel
   skipping is unnecessary because unoccupied candidates simply drop out).
   Selection is a per-row cumsum + batched searchsorted — no scatters.

Rays that would have produced more than S samples are flagged ``truncated``
(the analog of hitting the sample-budget cap, `ray_sampler.h:74-80`), which
suppresses the background term downstream like `calc_rgb.h:68-71`.

Everything here is shape-static, differentiation-free, and fuses into a
handful of XLA kernels (gather / cumsum / gather).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .occupancy import GridConfig, mip_from_dt_xyz, occupancy_at_xyz


@dataclass(frozen=True)
class MarchConfig:
    grid: GridConfig
    near_distance: float = 0.2
    cone_angle: float = 0.0  # 0 => const_dt
    const_dt: bool = True
    n_candidates: int = 0  # K; 0 => derive from geometry
    # Occupancy is probed every `probe_stride` candidates (segment-center
    # probe applied to the whole segment).  Random bool gathers run at only
    # ~0.1G/s on TPU (tools/probe_tpu2.py), and with const_dt there are ~9
    # candidates per grid voxel, so probing each candidate is ~9x redundant.
    # 0 => auto (~one probe per voxel crossing); 1 => exact per-candidate.
    probe_stride: int = 0

    def __post_init__(self):
        if self.n_candidates == 0:
            object.__setattr__(self, "n_candidates", self.default_candidates())
        if self.probe_stride == 0:
            if self.const_dt:
                voxel = self.grid.aabb_diag / self.grid.grid_size
                stride = max(1, int(round(voxel / self.dt_const)))
                stride = 1 << (stride.bit_length() - 1)  # pow2 for reshapes
            else:
                stride = 1  # cone-angle steps already track voxel scale
            object.__setattr__(self, "probe_stride", min(stride, 8))
        assert self.n_candidates % self.probe_stride == 0

    @property
    def dt_min(self) -> float:
        return self.grid.stepsize

    @property
    def dt_max(self) -> float:
        return self.grid.max_cone_stepsize

    @property
    def dt_const(self) -> float:
        # `calc_dt` with const_dt: MIN_CONE_STEPSIZE() * 0.5
        # (`density_grid_sampler.py:107-110`).
        return self.grid.stepsize * 0.5

    def default_candidates(self) -> int:
        """K large enough to cover the longest aabb chord, capped at the
        reference's NERF_STEPS-bounded march length."""
        diag = self.grid.aabb_diag * math.sqrt(3.0)
        if self.const_dt:
            k = int(math.ceil(diag / self.dt_const))
        else:
            # Linear phase until t*c >= dt_min, then geometric growth.
            c = self.cone_angle
            t1 = self.dt_min / max(c, 1e-9)
            k_lin = int(math.ceil(min(t1, diag) / self.dt_min))
            k_geo = 0
            if diag > t1:
                k_geo = int(math.ceil(math.log(diag / t1) / math.log1p(c))) + 1
            k = k_lin + k_geo
        k = min(k, 4 * self.grid.max_steps)
        return max(-(-k // 128) * 128, 128)  # pad to lane multiples


class RaySamples(NamedTuple):
    """Fixed [R, S] sample batch (the static-shape NerfCoordinate buffer)."""

    positions: jnp.ndarray  # [R, S, 3] warped (aabb-relative) positions
    dirs: jnp.ndarray  # [R, S, 3] warped directions ((d+1)/2)
    dts: jnp.ndarray  # [R, S] step sizes (world units, *not* warp_dt'd)
    valid: jnp.ndarray  # [R, S] bool
    numsteps: jnp.ndarray  # [R] int32 = min(count, S)
    truncated: jnp.ndarray  # [R] bool: ray had more than S occupied candidates
    count: jnp.ndarray  # [R] int32 occupied candidates, capped at NERF_STEPS —
    # the *demand*, which drives batch-size adaptation like the reference's
    # uncapped per-ray numsteps (`compacted_coord.h:63-66`)


def aabb_ray_intersect(rays_o, rays_d, aabb_min: float, aabb_max: float):
    """Slab test (`ray_sampler_header.h:408-470`). Returns (tmin, tmax)."""
    inv = 1.0 / rays_d  # inf for axis-parallel components is fine under IEEE
    t0 = (aabb_min - rays_o) * inv
    t1 = (aabb_max - rays_o) * inv
    tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    return tmin, jnp.where(tmax >= tmin, tmax, tmin)


def _ray_components(rays):
    """[R, 3] -> three [R] arrays (SoA; avoids minor-dim-3 tiling waste)."""
    return rays[:, 0], rays[:, 1], rays[:, 2]


def dt_at(cfg: MarchConfig, t):
    """Step size at time t (calc_dt closed form)."""
    if cfg.const_dt:
        return jnp.broadcast_to(jnp.float32(cfg.dt_const), t.shape)
    return jnp.clip(t * cfg.cone_angle, cfg.dt_min, cfg.dt_max)


def ts_at(cfg: MarchConfig, t_start, k):
    """Candidate time at (fractional) step index k [R, X] from start [R].

    Closed-form evaluation of the reference's t += calc_dt(t) recurrence at
    ARBITRARY indices — lets the strided march evaluate t only at probe
    centers and selected samples instead of materializing [R, K] grids.
    """
    t0 = t_start[:, None]
    if cfg.const_dt:
        return t0 + k * cfg.dt_const
    c = cfg.cone_angle
    t_lin_end = cfg.dt_min / c  # below this, steps are dt_min
    t_geo_end = cfg.dt_max / c  # above this, steps are dt_max
    # Phase 1: n1 steps of dt_min until t >= t_lin_end.
    n1 = jnp.ceil(jnp.maximum(t_lin_end - t0, 0.0) / cfg.dt_min)
    t_at_n1 = t0 + n1 * cfg.dt_min
    # Phase 2: geometric, t_{k+1} = t_k * (1 + c), until t >= t_geo_end.
    log1pc = math.log1p(c)
    n2 = jnp.ceil(
        jnp.maximum(jnp.log(t_geo_end / jnp.maximum(t_at_n1, 1e-10)), 0.0) / log1pc
    )
    t_at_n2 = t_at_n1 * jnp.exp(n2 * log1pc)
    in1 = k < n1
    in2 = (~in1) & (k < n1 + n2)
    t = jnp.where(
        in1,
        t0 + k * cfg.dt_min,
        jnp.where(
            in2,
            t_at_n1 * jnp.exp((k - n1) * log1pc),
            t_at_n2 + (k - n1 - n2) * cfg.dt_max,
        ),
    )
    return t


def candidate_ts(cfg: MarchConfig, t_start, n: int):
    """[R] start times -> ([R, n] candidate times, [R, n] step sizes)."""
    k = jnp.arange(n, dtype=jnp.float32)[None, :]
    t = ts_at(cfg, t_start, k)
    return t, dt_at(cfg, t)


def _first_s_indices(occ, s: int):
    """For each row of occ [R, K], indices of the first s True entries.

    Returns (idx [R, s] clamped to K-1, count [R]).  Uses the monotone
    per-row cumsum, then `searchsorted_left(cum, t) == #(cum < t)` — the
    count form is a pure broadcast-compare + lane reduction, where the
    vmapped binary search it replaces lowered to element-gather loops
    (~24 ns/access on this chip, several ms at bench scale).
    """
    cum = jnp.cumsum(occ.astype(jnp.int32), axis=1)  # [R, K]
    count = cum[:, -1]
    targets = jnp.arange(1, s + 1, dtype=jnp.int32)
    idx = jnp.sum(
        (cum[:, None, :] < targets[None, :, None]).astype(jnp.int32), axis=2
    )  # [R, s]
    return jnp.minimum(idx, occ.shape[1] - 1), count


def sample_rays(
    cfg: MarchConfig,
    bitfield,
    rays_o,
    rays_d,
    key,
    n_samples: int,
) -> RaySamples:
    """March R rays against the occupancy grid into an [R, S] sample batch."""
    g = cfg.grid
    tmin, tmax = aabb_ray_intersect(rays_o, rays_d, g.aabb_min, g.aabb_max)
    tmin = jnp.maximum(tmin, cfg.near_distance)

    # Jittered start: startt += calc_dt(startt) * rand (`ray_sampler.h:46-48`).
    u = jax.random.uniform(key, tmin.shape)
    dt0 = (
        cfg.dt_const
        if cfg.const_dt
        else jnp.clip(tmin * cfg.cone_angle, cfg.dt_min, cfg.dt_max)
    )
    t_start = tmin + dt0 * u

    # Candidate positions as separate x/y/z arrays: a [R, K, 3] AoS array
    # would tile-pad its minor dim to 128 lanes (42x HBM waste).
    ox, oy, oz = _ray_components(rays_o)
    dx, dy, dz = _ray_components(rays_d)

    # Strided occupancy probing (see MarchConfig.probe_stride): one bitfield
    # lookup per segment of `stride` candidates, probed at segment center;
    # inside-ness is also evaluated per segment so segments are strictly
    # all-or-none, letting the first-S selection run at probe granularity
    # (stride^2-fold cheaper cumsum + searchsorted).  Candidate times come
    # from the closed form ts_at at exactly the indices needed — the full
    # [R, K] t/dt grids are never materialized.
    stride = cfg.probe_stride
    # Degrade the stride rather than fall back to the unstrided path: the
    # full [R, K] probe materializes an [R*K, G] bool gather temp (16 GB at
    # R=128k, K=1024, G=128 — observed OOM), while stride halving just
    # coarsens probe granularity.
    while stride > 1 and n_samples % stride:
        stride //= 2
    if stride > 1:
        kp = jnp.arange(0, cfg.n_candidates, stride, jnp.float32)[None, :]
        tp = 0.5 * (ts_at(cfg, t_start, kp)
                    + ts_at(cfg, t_start, kp + (stride - 1)))  # [R, K/s]
        qx = ox[:, None] + tp * dx[:, None]
        qy = oy[:, None] + tp * dy[:, None]
        qz = oz[:, None] + tp * dz[:, None]
        dtp = dt_at(cfg, ts_at(cfg, t_start, kp))

        def _inp(p):
            return (p >= g.aabb_min) & (p <= g.aabb_max)

        inside_p = _inp(qx) & _inp(qy) & _inp(qz) & (tp <= tmax[:, None])
        mip = mip_from_dt_xyz(dtp, qx, qy, qz, g)
        occ_p = inside_p & occupancy_at_xyz(bitfield, qx, qy, qz, mip, g)

        sp = n_samples // stride
        pidx, pcount = _first_s_indices(occ_p, sp)  # [R, S/s], [R]
        within = jnp.arange(stride, dtype=jnp.int32)[None, None, :]
        idx = (pidx[:, :, None] * stride + within).reshape(-1, n_samples)
        count = pcount * stride
    else:
        t, dt = candidate_ts(cfg, t_start, cfg.n_candidates)  # [R, K]
        px = ox[:, None] + t * dx[:, None]
        py = oy[:, None] + t * dy[:, None]
        pz = oz[:, None] + t * dz[:, None]

        def _in(p):
            return (p >= g.aabb_min) & (p <= g.aabb_max)

        inside = _in(px) & _in(py) & _in(pz) & (t <= tmax[:, None])
        mip = mip_from_dt_xyz(dt, px, py, pz, g)
        occ = inside & occupancy_at_xyz(bitfield, px, py, pz, mip, g)
        idx, count = _first_s_indices(occ, n_samples)  # [R, S], [R]

    t_sel = ts_at(cfg, t_start, idx.astype(jnp.float32))
    dt_sel = dt_at(cfg, t_sel)
    s_range = jnp.arange(n_samples, dtype=jnp.int32)[None, :]
    valid = s_range < count[:, None]

    # Exact per-candidate clipping (ADVICE r1): segment-granularity probes
    # evaluate inside-ness at segment centers only, so trailing candidates
    # of a boundary segment can lie past tmax or outside the aabb — mask
    # them geometrically instead of compositing them at clamped positions.
    valid = valid & (t_sel <= tmax[:, None])

    def _rel(o, d):
        return (o[:, None] + t_sel * d[:, None] - g.aabb_min) / g.aabb_diag

    wx, wy, wz = _rel(ox, dx), _rel(oy, dy), _rel(oz, dz)
    for w in (wx, wy, wz):
        valid = valid & (w >= 0.0) & (w <= 1.0)

    # warp_position = aabb.relative_pos (`ray_sampler_header.h:852-858`).
    def _warp(w):
        return jnp.where(valid, jnp.clip(w, 0.0, 1.0), 0.5)

    pos_warp = jnp.stack([_warp(wx), _warp(wy), _warp(wz)], axis=-1)
    dir_warp = jnp.broadcast_to(
        (rays_d * 0.5 + 0.5)[:, None, :], pos_warp.shape
    )
    return RaySamples(
        positions=pos_warp,
        dirs=dir_warp,
        dts=jnp.where(valid, dt_sel, 0.0),
        valid=valid,
        numsteps=jnp.minimum(count, n_samples),
        truncated=count > n_samples,
        count=jnp.minimum(count, g.max_steps),
    )
