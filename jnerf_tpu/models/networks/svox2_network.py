"""Plenoxels SparseGrid: density + SH coefficient voxel grid.

Parity target: `/root/reference/contrib/plenoxel/python/jnerf/models/networks/svox2_network.py`
(SparseGrid :18-163, volume_render paths :189-231, TV :232-290, npz
save/load :577-641).  TPU-first: the grid is dense (`ops/voxel_grid.py`
explains why the ``links`` indirection is dropped); world<->grid transforms,
SH basis, rendering, TV and 2x upsampling are all pure jnp.  The npz format
keeps svox2's field names (radius/center/links/density_data/sh_data) so
grids interchange with the reference's loader, with links emitted dense.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.ops.voxel_grid import (
    VoxelGridSpec,
    render_rays_grid,
    total_variation,
    trilinear_sample,
    upsample_grid,
)
from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import NETWORKS


@NETWORKS.register_module()
class SparseGrid:
    def __init__(self, reso=128, radius=1.0, center=(0.0, 0.0, 0.0),
                 basis_dim=9, basis_reso=16, use_z_order=False,
                 use_sphere_bound=False, nosphereinit=False, **_unused):
        cfg = get_cfg()
        if isinstance(reso, int):
            reso = (reso,) * 3
        self.spec = VoxelGridSpec(tuple(int(r) for r in reso), int(basis_dim))
        radius = np.broadcast_to(np.asarray(radius, np.float32), (3,)).copy()
        center = np.asarray(center, np.float32)
        self.radius = radius
        self.center = center
        self.init_sigma = float(cfg.init_sigma or 0.1)
        # world -> grid: gx = (x*scaling + offset) * (reso - 1)
        self._offset = 0.5 * (1.0 - center / radius)
        self._scaling = 0.5 / radius

    # ------------------------------------------------------------- params
    def init(self, key):
        X, Y, Z = self.spec.reso
        return {
            "density": jnp.full((X, Y, Z), self.init_sigma, jnp.float32),
            "sh": jnp.zeros((X, Y, Z, self.spec.sh_channels), jnp.float32),
        }

    # ---------------------------------------------------------- transforms
    def world2grid_points(self, pts):
        reso = jnp.asarray(self.spec.reso, jnp.float32)
        return (pts * self._scaling + self._offset) * (reso - 1)

    def world2grid_rays(self, rays_o, rays_d):
        """Returns grid-space origins/dirs + per-ray world length of one
        grid unit (for the compositing delta)."""
        reso = jnp.asarray(self.spec.reso, jnp.float32)
        scale = self._scaling * (reso - 1)
        go = (rays_o * self._scaling + self._offset) * (reso - 1)
        gd = rays_d * scale
        # delta_scale: world distance per unit grid-space t.
        norm_gd = jnp.linalg.norm(gd, axis=-1, keepdims=True)
        world_per_grid = jnp.linalg.norm(rays_d, axis=-1, keepdims=True) / norm_gd
        return go, gd, world_per_grid

    # ------------------------------------------------------------ queries
    def sample(self, params, pts_world):
        """(sigma [N], sh [N, C]) at world points — `sample_grid` parity."""
        gpts = self.world2grid_points(pts_world)
        return trilinear_sample(self.spec, params["density"], params["sh"], gpts)

    def volume_render(self, params, rays_o, rays_d, n_samples=None,
                      step_size=0.5, background_brightness=1.0,
                      sigma_thresh=1e-8):
        """World-space rays -> rgb [R, 3] (`volume_render_cuvol` parity)."""
        go, gd, world_per_grid = self.world2grid_rays(rays_o, rays_d)
        # Normalize grid dirs so t is in grid units; fold the world-units
        # conversion into the step size used for attenuation.
        gd_norm = jnp.linalg.norm(gd, axis=-1, keepdims=True)
        gdn = gd / gd_norm
        if n_samples is None:
            n_samples = int(np.ceil(np.linalg.norm(self.spec.reso) / step_size))
        # World-scale attenuation deltas (svox2's delta_scale), so sigma has
        # world-units semantics and svox2's tuned lrs/thresholds transfer.
        delta_scale = world_per_grid[:, 0]
        return render_rays_grid(
            self.spec, params["density"], params["sh"], go, gdn,
            n_samples, step_size, background_brightness, sigma_thresh,
            delta_scale=delta_scale,
        )

    # ---------------------------------------------------------------- regs
    def tv(self, params):
        return total_variation(params["density"])

    def tv_color(self, params):
        return total_variation(params["sh"])

    # ------------------------------------------------------------- resize
    def upsample(self, params, new_reso):
        if isinstance(new_reso, int):
            new_reso = (new_reso,) * 3
        new_reso = tuple(int(r) for r in new_reso)
        density, sh = upsample_grid(params["density"], params["sh"], new_reso)
        self.spec = VoxelGridSpec(new_reso, self.spec.basis_dim)
        return {"density": density, "sh": sh}

    # ------------------------------------------------------------ save/load
    def save_npz(self, path, params):
        X, Y, Z = self.spec.reso
        np.savez_compressed(
            path,
            radius=self.radius,
            center=self.center,
            links=np.arange(self.spec.n_cells, dtype=np.int32).reshape(X, Y, Z),
            density_data=np.asarray(params["density"]).reshape(-1, 1).astype(np.float16),
            sh_data=np.asarray(params["sh"]).reshape(-1, self.spec.sh_channels).astype(np.float16),
            basis_type=1,
        )

    def load_npz(self, path):
        z = np.load(path)
        links = z["links"]
        reso = links.shape
        n = reso[0] * reso[1] * reso[2]
        density = np.zeros((n,), np.float32)
        sh = np.zeros((n, z["sh_data"].shape[1]), np.float32)
        flat_links = links.reshape(-1)
        valid = flat_links >= 0
        density[valid] = z["density_data"].astype(np.float32)[flat_links[valid], 0]
        sh[valid] = z["sh_data"].astype(np.float32)[flat_links[valid]]
        self.spec = VoxelGridSpec(tuple(int(r) for r in reso),
                                  sh.shape[1] // 3)
        self.radius = z["radius"]
        self.center = z["center"]
        self._offset = 0.5 * (1.0 - self.center / self.radius)
        self._scaling = 0.5 / self.radius
        return {
            "density": jnp.asarray(density.reshape(reso)),
            "sh": jnp.asarray(sh.reshape(*reso, -1)),
        }
