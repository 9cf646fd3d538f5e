"""Blender/NGP-json dataset with device-side ray generation.

Parity target: `/root/reference/python/jnerf/dataset/dataset.py` (NerfDataset).
Differences by design (TPU-first):

- Images live on device as one flat ``[n_images*H*W, 4]`` float32 array;
  per-step pixel selection and ray generation happen *inside* the jitted
  train step (`sample_batch` below is pure and jittable), so there is no
  host<->device traffic per iteration.
- Per-epoch ``randperm`` pixel walks are replaced by with-replacement
  uniform pixel sampling from a threaded `jax.random` key (the reference's
  shuffle is just a variance-reduction detail; Instant-NGP upstream samples
  with replacement too).
- Camera distortion coefficients (k1/k2/p1/p2) are carried in ``metadata``
  for parity but, like the reference's ray generators
  (`dataset.py:172-188`), not applied to ray directions.
"""

from __future__ import annotations

import json
import os
from math import pi

import jax.numpy as jnp
import numpy as np

from jnerf_tpu.utils.registry import DATASETS
from .dataset_util import NERF_SCALE, fov_to_focal_length, read_image


def matrix_nerf2ngp(matrix: np.ndarray, scale, offset, correct_pose=(1, -1, -1)):
    """NeRF [3,4] camera-to-world -> NGP coordinates.

    Axis sign flips, translation scale+offset into the unit cube, then the
    row cycle [1,2,0] (`dataset.py:255-262`).
    """
    m = np.array(matrix, dtype=np.float32, copy=True)
    m[:, 0] *= correct_pose[0]
    m[:, 1] *= correct_pose[1]
    m[:, 2] *= correct_pose[2]
    m[:, 3] = m[:, 3] * scale + np.asarray(offset, dtype=np.float32)
    return m[[1, 2, 0]]


def matrix_ngp2nerf(matrix: np.ndarray, scale, offset, correct_pose=(1, -1, -1)):
    m = np.array(matrix, dtype=np.float32, copy=True)
    m = m[[2, 0, 1]]
    m[:, 0] *= correct_pose[0]
    m[:, 1] *= correct_pose[1]
    m[:, 2] *= correct_pose[2]
    m[:, 3] = (m[:, 3] - np.asarray(offset, dtype=np.float32)) / scale
    return m


def rays_from_pixels(pixel_index, transforms, focal_lengths, principal_points, W, H):
    """Camera rays for flat pixel indices over [n_images, H, W]. Jittable.

    Math mirrors `dataset.py:172-188`: pixel centers normalized to [0,1],
    displaced from the principal point in focal-length units, rotated by the
    camera-to-world rotation, normalized.

    Args:
      pixel_index: [B] int32, flat index into n_images*H*W.
      transforms: [n_images, 3, 4] NGP-space camera-to-world.
      focal_lengths: [n_images, 2].
      principal_points: [n_images, 2] (normalized cx, cy).
    Returns:
      img_ids [B], rays_o [B,3], rays_d [B,3] (unit norm).
    """
    hw = H * W
    img_id = pixel_index // hw
    off = pixel_index % hw
    x = ((off % W).astype(jnp.float32) + 0.5) / W
    y = ((off // W).astype(jnp.float32) + 0.5) / H
    xy = jnp.stack([x, y], axis=-1)
    xf = transforms[img_id]
    fl = focal_lengths[img_id]
    pp = principal_points[img_id]
    res = jnp.array([W, H], jnp.float32)
    d_cam = jnp.concatenate(
        [(xy - pp) * res / fl, jnp.ones_like(x)[:, None]], axis=-1
    )
    d_world = jnp.einsum("bij,bj->bi", xf[:, :, :3], d_cam)
    rays_d = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    rays_o = xf[:, :, 3]
    return img_id, rays_o, rays_d


def rays_for_image(transform, focal_length, principal_point, W, H):
    """Full-image rays for one [3,4] NGP-space pose. Jittable.

    Pixel order is row-major (y outer, x inner), matching
    `generate_rays_total_test` (`dataset.py:209-234`).
    Returns rays_o [H*W,3], rays_d [H*W,3].
    """
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    xy = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)
    res = jnp.array([W, H], jnp.float32)
    d_cam = jnp.concatenate(
        [(xy - principal_point) * res / focal_length, jnp.ones((H * W, 1))], axis=-1
    )
    d_world = d_cam @ transform[:, :3].T
    rays_d = d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(transform[:, 3], (H * W, 3))
    return rays_o, rays_d


@DATASETS.register_module()
class NerfDataset:
    def __init__(
        self,
        root_dir,
        batch_size,
        mode="train",
        H=0,
        W=0,
        correct_pose=(1, -1, -1),
        aabb_scale=None,
        scale=None,
        offset=None,
        img_alpha=True,
        have_img=True,
        preload_shuffle=True,
    ):
        assert mode in ("train", "val", "test")
        self.root_dir = root_dir
        self.batch_size = batch_size
        self.mode = mode
        self.H, self.W = int(H), int(W)
        self.correct_pose = list(correct_pose)
        self.aabb_scale = aabb_scale
        self.scale = NERF_SCALE if scale is None else scale
        self.offset = [0.5, 0.5, 0.5] if offset is None else list(offset)
        self.img_alpha = img_alpha
        self.have_img = have_img
        self.preload_shuffle = preload_shuffle
        self.n_images = 0
        self._rng = np.random.default_rng(0)
        self.load_data()

    # ------------------------------------------------------------------ load
    def _find_json_paths(self, root_dir):
        paths = []
        for root, _dirs, files in os.walk(root_dir):
            for fname in files:
                stem, ext = os.path.splitext(fname)
                if ext != ".json":
                    continue
                if self.mode in stem or (self.mode == "train" and "val" in stem):
                    paths.append(os.path.join(root, fname))
        return sorted(paths)

    def load_data(self):
        json_data = None
        for path in self._find_json_paths(self.root_dir):
            with open(path, "r") as f:
                data = json.load(f)
            if json_data is None:
                json_data = data
            else:
                json_data["frames"] += data["frames"]
        assert json_data is not None, f"dataset not found at {self.root_dir}"

        if "h" in json_data:
            self.H = int(json_data["h"])
        if "w" in json_data:
            self.W = int(json_data["w"])

        frames = json_data["frames"]
        if self.mode == "val":
            frames = frames[::10]

        images, transforms = [], []
        for frame in frames:
            if self.have_img:
                img_path = os.path.join(self.root_dir, frame["file_path"])
                if not os.path.exists(img_path):
                    img_path = img_path + ".png"
                    if not os.path.exists(img_path):
                        continue
                img = read_image(img_path)
                if self.H == 0 or self.W == 0:
                    self.H, self.W = int(img.shape[0]), int(img.shape[1])
                images.append(img)
            else:
                images.append(np.zeros((self.H, self.W, 3), np.float32))
            matrix = np.array(frame["transform_matrix"], np.float32)[:3, :]
            transforms.append(
                matrix_nerf2ngp(matrix, self.scale, self.offset, self.correct_pose)
            )
        self.n_images = len(images)
        assert self.n_images > 0, f"no frames loaded from {self.root_dir}"

        self.resolution = [self.W, self.H]
        if self.aabb_scale is None:
            self.aabb_scale = json_data.get("aabb_scale", 1)
        self.aabb_range = (0.5 - self.aabb_scale / 2, 0.5 + self.aabb_scale / 2)

        # Camera metadata (k1,k2,p1,p2, cx,cy normalized, fl_x,fl_y, light_dir)
        # mirrors `dataset.py:122-152`.
        def read_focal(res, axis):
            if "fl_" + axis in json_data:
                return json_data["fl_" + axis]
            if "camera_angle_" + axis in json_data:
                return fov_to_focal_length(res, json_data["camera_angle_" + axis] * 180 / pi)
            return 0.0

        fx = read_focal(self.W, "x")
        fy = read_focal(self.H, "y")
        if fx != 0:
            focal = [fx, fy if fy != 0 else fx]
        elif fy != 0:
            focal = [fy, fy]
        else:
            raise RuntimeError("couldn't read fov from transforms json")

        meta = np.zeros([11], np.float32)
        meta[0] = json_data.get("k1", 0)
        meta[1] = json_data.get("k2", 0)
        meta[2] = json_data.get("p1", 0)
        meta[3] = json_data.get("p2", 0)
        meta[4] = json_data.get("cx", self.W / 2) / self.W
        meta[5] = json_data.get("cy", self.H / 2) / self.H
        meta[6:8] = focal
        self.metadata = np.tile(meta[None], (self.n_images, 1))
        self.focal_lengths = jnp.asarray(
            np.tile(np.array(focal, np.float32)[None], (self.n_images, 1))
        )
        self.principal_points = jnp.asarray(self.metadata[:, 4:6])

        imgs = np.stack(images, axis=0).astype(np.float32)
        if self.img_alpha and imgs.shape[-1] == 3:
            imgs = np.concatenate(
                [imgs, np.ones(imgs.shape[:-1] + (1,), np.float32)], axis=-1
            )
        # Flat [n*H*W, 4] so pixel gathers inside jit are 1-D.
        self.image_data = jnp.asarray(imgs.reshape(self.n_images * self.H * self.W, -1))
        self.transforms_gpu = jnp.asarray(np.stack(transforms, axis=0))

    # ------------------------------------------------------------ batch iter
    def sample_batch(self, key):
        """Jittable: random pixel batch -> (img_ids, rays_o, rays_d, rgba)."""
        import jax

        idx = jax.random.randint(
            key, (self.batch_size,), 0, self.n_images * self.H * self.W
        )
        img_ids, rays_o, rays_d = rays_from_pixels(
            idx, self.transforms_gpu, self.focal_lengths, self.principal_points,
            self.W, self.H,
        )
        return img_ids, rays_o, rays_d, self.image_data[idx]

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

    # --------------------------------------------------------------- render
    def generate_rays_total_test(self, img_id: int):
        """Full-image rays for a dataset camera; returns (rays_o, rays_d)."""
        return rays_for_image(
            self.transforms_gpu[img_id],
            self.focal_lengths[img_id],
            self.principal_points[img_id],
            self.W,
            self.H,
        )

    def generate_rays_with_pose(self, pose: np.ndarray):
        """Full-image rays for an external NeRF-space [3,4] pose."""
        ngp_pose = jnp.asarray(
            matrix_nerf2ngp(pose, self.scale, self.offset, self.correct_pose)
        )
        return rays_for_image(
            ngp_pose,
            self.focal_lengths[0],
            self.principal_points[0],
            self.W,
            self.H,
        )

    def image(self, img_id: int) -> np.ndarray:
        hw = self.H * self.W
        return np.asarray(self.image_data[img_id * hw : (img_id + 1) * hw]).reshape(
            self.H, self.W, -1
        )
