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
    build_sparse,
    dilate_mask,
    render_rays_grid,
    render_rays_grid_sparse,
    total_variation,
    total_variation_sparse,
    trilinear_sample,
    trilinear_sample_sparse,
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
        # Sparse mode (512^3-scale): dense grids above this cell count are
        # sparsified on upsample (15 GB dense at 512^3 with SH + grads +
        # RMSprop state vs ~3 GB sparse).  links/cells live on the runner
        # side and are passed through `aux` (NOT captured in jit closures:
        # closed-over device arrays ship to the remote compiler as
        # constants).
        self.sparse = False
        self.sparse_cell_threshold = int(
            cfg.sparse_cell_threshold or (300 ** 3)
        )
        self.density_thresh = float(
            cfg.density_thresh if cfg.density_thresh is not None else 1.0
        )
        self.sparse_dilate = int(
            cfg.sparse_dilate if cfg.sparse_dilate is not None else 2
        )

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
    def sample(self, params, pts_world, aux=None):
        """(sigma [N], sh [N, C]) at world points — `sample_grid` parity."""
        gpts = self.world2grid_points(pts_world)
        if self.sparse:
            return trilinear_sample_sparse(
                self.spec, aux["links"], params["density_data"],
                params["sh_data"], gpts,
            )
        return trilinear_sample(self.spec, params["density"], params["sh"], gpts)

    def volume_render(self, params, rays_o, rays_d, n_samples=None,
                      step_size=0.5, background_brightness=1.0,
                      sigma_thresh=1e-8, aux=None):
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
        if self.sparse:
            return render_rays_grid_sparse(
                self.spec, aux["links"], params["density_data"],
                params["sh_data"], go, gdn,
                n_samples, step_size, background_brightness, sigma_thresh,
                delta_scale=delta_scale,
            )
        return render_rays_grid(
            self.spec, params["density"], params["sh"], go, gdn,
            n_samples, step_size, background_brightness, sigma_thresh,
            delta_scale=delta_scale,
        )

    # ---------------------------------------------------------------- regs
    def tv(self, params, aux=None, key=None, n_subset=1 << 18):
        if self.sparse:
            return total_variation_sparse(
                self.spec, aux["links"], aux["cells"],
                params["density_data"], key, n_subset,
            )
        return total_variation(params["density"])

    def tv_color(self, params, aux=None, key=None, n_subset=1 << 16):
        if self.sparse:
            return total_variation_sparse(
                self.spec, aux["links"], aux["cells"],
                params["sh_data"], key, n_subset,
            )
        return total_variation(params["sh"])

    # ------------------------------------------------------------- resize
    def upsample(self, params, new_reso):
        """Trilinear resize (`svox2_network.py` resample); beyond
        `sparse_cell_threshold` cells, also sparsify: threshold the
        upsampled density, dilate the mask (reference resample's 2-pass
        threshold + dilate, :320-...), and keep only active cells' data.

        Returns (params, aux): aux holds non-trainable {links, cells}
        (empty when dense).
        """
        if isinstance(new_reso, int):
            new_reso = (new_reso,) * 3
        new_reso = tuple(int(r) for r in new_reso)
        assert not self.sparse, "re-sparsifying a sparse grid is not supported yet"
        old_spec = self.spec
        density_old, sh_old = params["density"], params["sh"]
        self.spec = VoxelGridSpec(new_reso, self.spec.basis_dim)
        n_cells = new_reso[0] * new_reso[1] * new_reso[2]
        if n_cells <= self.sparse_cell_threshold:
            density, sh = upsample_grid(density_old, sh_old, new_reso)
            return {"density": density, "sh": sh}, {}

        # Sparse upsample: dense density (0.5 GB at 512^3) is affordable;
        # dense SH (14 GB) is not — interpolate SH only at active cells.
        density = jax.image.resize(
            density_old[..., None], new_reso + (1,), method="trilinear"
        )[..., 0]
        mask = dilate_mask(density > self.density_thresh, self.sparse_dilate)
        links, ddata, sdata, cells = self._build_sparse_chunked(
            density_old, sh_old, density, np.asarray(mask), old_spec
        )
        self.sparse = True
        return (
            {"density_data": ddata, "sh_data": sdata},
            {"links": jnp.asarray(links), "cells": cells},
        )

    def _build_sparse_chunked(self, density_old, sh_old, density_new, mask_np,
                              old_spec):
        """links/cells from the mask; SH data interpolated from the old
        grid at active new-cell centers, in chunks (never materializes a
        dense high-res SH volume)."""
        X, Y, Z = self.spec.reso
        active = np.flatnonzero(mask_np.reshape(-1))
        n = active.size
        cap = -(-max(n, 1) // (1 << 15)) * (1 << 15)
        links = np.full(X * Y * Z, -1, np.int32)
        links[active] = np.arange(n, dtype=np.int32)
        cells = np.full((cap,), -1, np.int32)
        cells[:n] = active
        ddata = np.zeros((cap,), np.float32)
        ddata[:n] = np.asarray(density_new).reshape(-1)[active]
        C = self.spec.sh_channels
        sdata = np.zeros((cap, C), np.float32)
        scale = (np.asarray(old_spec.reso, np.float32) - 1) / (
            np.asarray(self.spec.reso, np.float32) - 1
        )
        chunk = 1 << 20
        interp = jax.jit(
            lambda d, s, p: trilinear_sample(old_spec, d, s, p)[1]
        )
        for lo in range(0, n, chunk):
            ids = active[lo : lo + chunk]
            z = ids % Z
            y = (ids // Z) % Y
            x = ids // (Y * Z)
            gpts = np.stack([x, y, z], -1).astype(np.float32) * scale[None]
            sdata[lo : lo + ids.size] = np.asarray(
                interp(density_old, sh_old, jnp.asarray(gpts))
            )
        return links.reshape(X, Y, Z), jnp.asarray(ddata), jnp.asarray(sdata), jnp.asarray(cells)

    # ------------------------------------------------------------ save/load
    def save_npz(self, path, params, aux=None):
        """svox2's native npz schema; the sparse mode emits real sparse
        links (`svox2_network.py:577-641`), the dense mode identity links."""
        X, Y, Z = self.spec.reso
        if self.sparse:
            links = np.asarray(aux["links"], np.int32)
            n = int(links.max()) + 1
            np.savez_compressed(
                path,
                radius=self.radius,
                center=self.center,
                links=links,
                density_data=np.asarray(params["density_data"])[:n]
                .reshape(-1, 1).astype(np.float16),
                sh_data=np.asarray(params["sh_data"])[:n].astype(np.float16),
                basis_type=1,
            )
            return
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
        """Returns (params, aux).  Grids whose cell count exceeds the sparse
        threshold load into the sparse tables; smaller ones densify."""
        z = np.load(path)
        links = z["links"]
        reso = links.shape
        n_cells = reso[0] * reso[1] * reso[2]
        self.spec = VoxelGridSpec(tuple(int(r) for r in reso),
                                  z["sh_data"].shape[1] // 3)
        self.radius = z["radius"]
        self.center = z["center"]
        self._offset = 0.5 * (1.0 - self.center / self.radius)
        self._scaling = 0.5 / self.radius
        flat_links = links.reshape(-1)
        if n_cells > self.sparse_cell_threshold:
            self.sparse = True
            n = z["density_data"].shape[0]
            cap = -(-max(n, 1) // (1 << 15)) * (1 << 15)
            ddata = np.zeros((cap,), np.float32)
            sdata = np.zeros((cap, z["sh_data"].shape[1]), np.float32)
            ddata[:n] = z["density_data"].astype(np.float32)[:, 0]
            sdata[:n] = z["sh_data"].astype(np.float32)
            cells = np.full((cap,), -1, np.int32)
            valid = flat_links >= 0
            cells[flat_links[valid]] = np.flatnonzero(valid).astype(np.int32)
            return (
                {"density_data": jnp.asarray(ddata),
                 "sh_data": jnp.asarray(sdata)},
                {"links": jnp.asarray(links), "cells": jnp.asarray(cells)},
            )
        self.sparse = False
        density = np.zeros((n_cells,), np.float32)
        sh = np.zeros((n_cells, z["sh_data"].shape[1]), np.float32)
        valid = flat_links >= 0
        density[valid] = z["density_data"].astype(np.float32)[flat_links[valid], 0]
        sh[valid] = z["sh_data"].astype(np.float32)[flat_links[valid]]
        return {
            "density": jnp.asarray(density.reshape(reso)),
            "sh": jnp.asarray(sh.reshape(*reso, -1)),
        }, {}
