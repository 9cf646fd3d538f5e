"""In-memory procedural dataset (no disk IO, no network).

Registered as ``SyntheticSpheresDataset``: renders the analytic sphere scene
from ``jnerf_tpu.dataset.synthetic`` straight into device arrays with the
same interface as ``NerfDataset``.  Used by ``bench.py`` and
``__graft_entry__.py`` — the environment cannot download blender lego
(SURVEY.md §4 fixture note), and for throughput benchmarking what matters is
matching lego's ray/occupancy statistics, not its pixels.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from jnerf_tpu.utils.registry import DATASETS
from .dataset import matrix_nerf2ngp, rays_for_image, rays_from_pixels
from .dataset_util import NERF_SCALE, fov_to_focal_length
from .synthetic import _look_at_pose, render_analytic


@DATASETS.register_module()
class SyntheticSpheresDataset:
    def __init__(
        self,
        batch_size=4096,
        mode="train",
        n_images=16,
        H=256,
        W=256,
        camera_angle_x=0.6911112070083618,
        aabb_scale=1,
        scale=None,
        offset=None,
        seed=0,
        have_img=True,
        root_dir=None,  # accepted for config-surface parity, unused
        preload_shuffle=True,
        scene="spheres",
        ssaa=1,
    ):
        del root_dir, preload_shuffle
        self.mode = mode
        self.batch_size = batch_size
        self.n_images = int(n_images)
        self.H, self.W = int(H), int(W)
        self.have_img = have_img
        self.scale = NERF_SCALE if scale is None else scale
        self.offset = [0.5, 0.5, 0.5] if offset is None else list(offset)
        self.aabb_scale = aabb_scale
        self.aabb_range = (0.5 - aabb_scale / 2, 0.5 + aabb_scale / 2)
        self.resolution = [self.W, self.H]

        rng = np.random.default_rng(seed + {"train": 0, "val": 1, "test": 2}[mode])
        poses = []
        for i in range(self.n_images):
            theta = 2 * np.pi * i / self.n_images + rng.uniform(-0.1, 0.1)
            phi = np.radians(rng.uniform(-20, 50))
            eye = 4.0 * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
            )
            poses.append(_look_at_pose(eye))
        images = self._render_cached(poses, scene, int(ssaa),
                                     camera_angle_x, seed)
        transforms = [matrix_nerf2ngp(p, self.scale, self.offset)
                      for p in poses]

        focal = fov_to_focal_length(self.W, np.degrees(camera_angle_x))
        self.focal_lengths = jnp.asarray(
            np.full((self.n_images, 2), focal, np.float32)
        )
        self.principal_points = jnp.asarray(
            np.full((self.n_images, 2), 0.5, np.float32)
        )
        meta = np.zeros((self.n_images, 11), np.float32)
        meta[:, 4:6] = 0.5
        meta[:, 6:8] = focal
        self.metadata = meta
        self.image_data = jnp.asarray(
            np.stack(images).reshape(self.n_images * self.H * self.W, 4)
        )
        self.transforms_gpu = jnp.asarray(np.stack(transforms))
        self._rng = np.random.default_rng(seed)

    def _render_cached(self, poses, scene, ssaa, camera_angle_x, seed):
        """Render the pose list, with an npz disk cache for expensive
        variants (the hard scene at SSAA is ~100 objects x ssaa^2 subpixel
        rays — minutes of numpy per quality run without the cache)."""
        key = None
        if scene != "spheres" or ssaa > 1:
            import hashlib

            h = hashlib.sha1(
                repr((scene, ssaa, self.mode, self.n_images, self.H, self.W,
                      round(camera_angle_x, 9), seed,
                      np.round(np.stack(poses), 7).tolist())).encode()
            ).hexdigest()[:16]
            cache_dir = os.path.join(
                os.environ.get("JNERF_SCENE_CACHE",
                               os.path.join("logs", "scene_cache")))
            key = os.path.join(cache_dir, f"{scene}_{h}.npz")
            if os.path.exists(key):
                return list(np.load(key)["images"])
        images = [render_analytic(p, self.H, self.W, camera_angle_x,
                                  scene=scene, ssaa=ssaa) for p in poses]
        if key is not None:
            os.makedirs(os.path.dirname(key), exist_ok=True)
            tmp = key[:-4] + f".{os.getpid()}.tmp.npz"
            np.savez_compressed(tmp, images=np.stack(images))
            os.replace(tmp, key)  # atomic vs concurrent quality runs
        return images

    def __next__(self):
        idx = jnp.asarray(
            self._rng.integers(
                0, self.n_images * self.H * self.W, size=self.batch_size
            ).astype(np.int32)
        )
        img_ids, rays_o, rays_d = rays_from_pixels(
            idx, self.transforms_gpu, self.focal_lengths, self.principal_points,
            self.W, self.H,
        )
        return img_ids, rays_o, rays_d, self.image_data[idx]

    def __iter__(self):
        return self

    def generate_rays_total_test(self, img_id: int):
        return rays_for_image(
            self.transforms_gpu[img_id],
            self.focal_lengths[img_id],
            self.principal_points[img_id],
            self.W,
            self.H,
        )

    def generate_rays_with_pose(self, pose):
        ngp = jnp.asarray(matrix_nerf2ngp(np.asarray(pose), self.scale, self.offset))
        return rays_for_image(
            ngp, self.focal_lengths[0], self.principal_points[0], self.W, self.H
        )

    def image(self, img_id: int) -> np.ndarray:
        hw = self.H * self.W
        return np.asarray(self.image_data[img_id * hw : (img_id + 1) * hw]).reshape(
            self.H, self.W, -1
        )
