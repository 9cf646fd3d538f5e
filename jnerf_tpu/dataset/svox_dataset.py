"""Plenoxels dataset: blender scenes as a flat shuffled ray pool.

Parity target: `/root/reference/contrib/plenoxel/python/jnerf/dataset/svox_dataset.py`
(SvoxNeRFDataset :16-102): per-pixel (origin, unit dir, rgb) tuples,
re-shuffled when exhausted; white background composited at load time like
svox2 (background_brightness=1).
"""

from __future__ import annotations

import json
import os
from math import pi

import jax.numpy as jnp
import numpy as np

from jnerf_tpu.utils.registry import DATASETS
from .dataset_util import fov_to_focal_length, read_image


@DATASETS.register_module()
class SvoxNeRFDataset:
    def __init__(self, root, split="train", epoch_size=None, batch_size=5000,
                 background_brightness=1.0, seed=0, **_unused):
        assert split in ("train", "val", "test")
        self.root_dir = root
        self.split = split
        self.batch_size = batch_size
        self._rng = np.random.default_rng(seed)

        json_path = os.path.join(root, f"transforms_{split}.json")
        with open(json_path) as f:
            meta = json.load(f)
        frames = meta["frames"]
        if split == "test":
            frames = frames[::10]

        images, poses = [], []
        for fr in frames:
            rel = fr["file_path"]
            rel = rel[2:] if rel.startswith("./") else rel
            p = os.path.join(root, rel)
            if not os.path.exists(p):
                p += ".png"
            img = read_image(p)
            if img.shape[-1] == 3:
                img = np.concatenate([img, np.ones_like(img[..., :1])], -1)
            images.append(img.astype(np.float32))
            poses.append(np.array(fr["transform_matrix"], np.float32))
        self.n_images = len(images)
        self.H, self.W = images[0].shape[:2]
        self.focal = fov_to_focal_length(self.W, meta["camera_angle_x"] * 180 / pi)
        self._images = images
        self._poses = poses
        self.bg = background_brightness

        x, y = np.meshgrid(
            np.arange(self.W, dtype=np.float32),
            np.arange(self.H, dtype=np.float32), indexing="xy",
        )
        cam_dirs = np.stack(
            [(x - self.W * 0.5 + 0.5) / self.focal,
             -(y - self.H * 0.5 + 0.5) / self.focal, -np.ones_like(x)], -1,
        )
        origins, dirs, rgbs = [], [], []
        for img, c2w in zip(images, poses):
            d = cam_dirs @ c2w[:3, :3].T
            d = d / np.linalg.norm(d, axis=-1, keepdims=True)
            origins.append(np.broadcast_to(c2w[:3, 3], d.shape).reshape(-1, 3))
            dirs.append(d.reshape(-1, 3))
            rgb = img[..., :3] * img[..., 3:] + self.bg * (1 - img[..., 3:])
            rgbs.append(rgb.reshape(-1, 3))
        self._origins = np.concatenate(origins).astype(np.float32)
        self._dirs = np.concatenate(dirs).astype(np.float32)
        self._rgbs = np.concatenate(rgbs).astype(np.float32)
        self._perm = self._rng.permutation(len(self._origins))
        self._cursor = 0

    def next_batch(self, batch_size=None):
        bs = batch_size or self.batch_size
        if self._cursor + bs > len(self._perm):
            self._perm = self._rng.permutation(len(self._origins))
            self._cursor = 0
        idx = self._perm[self._cursor : self._cursor + bs]
        self._cursor += bs
        return (
            jnp.asarray(self._origins[idx]),
            jnp.asarray(self._dirs[idx]),
            jnp.asarray(self._rgbs[idx]),
        )

    def rays_for_image(self, i):
        hw = self.H * self.W
        return (
            jnp.asarray(self._origins[i * hw : (i + 1) * hw]),
            jnp.asarray(self._dirs[i * hw : (i + 1) * hw]),
        )

    def image(self, i):
        return self._images[i]
