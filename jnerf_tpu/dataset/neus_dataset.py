"""DTU-style NeuS dataset: cameras_sphere.npz (world/scale mats) + images
+ masks.

Parity target: `/root/reference/python/jnerf/dataset/neus_dataset.py`
(`load_K_Rt_from_P` :13-34, random/full/between ray generators :102-168,
unit-sphere near/far :170-176).  The projection-matrix decomposition uses an
RQ factorization via numpy (no cv2.decomposeProjectionMatrix dependency).
"""

from __future__ import annotations

import os
from glob import glob

import jax.numpy as jnp
import numpy as np

from jnerf_tpu.utils.registry import DATASETS


def decompose_projection(P: np.ndarray):
    """P [3,4] -> (K [3,3] with K[2,2]=1, pose [4,4] camera-to-world).

    Equivalent to cv2.decomposeProjectionMatrix: RQ-decompose the left 3x3
    into an upper-triangular K (positive diagonal) and a rotation R, camera
    center from the null space.
    """
    M = P[:3, :3]
    # RQ decomposition via QR of the flipped transpose.
    flip = np.array([[0, 0, 1], [0, 1, 0], [1, 0, 0]], np.float64)
    Q, R = np.linalg.qr((flip @ M).T)
    K = flip @ R.T @ flip
    Rmat = flip @ Q.T
    # Make K's diagonal positive.
    signs = np.sign(np.diag(K))
    signs[signs == 0] = 1
    K = K * signs[None, :]
    Rmat = signs[:, None] * Rmat
    if np.linalg.det(Rmat) < 0:
        Rmat = -Rmat
    K = K / K[2, 2]
    # Camera center: P @ [c, 1] = 0.
    c = -np.linalg.inv(M) @ P[:3, 3]
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = Rmat.T
    pose[:3, 3] = c
    return K.astype(np.float32), pose


@DATASETS.register_module()
class NeuSDataset:
    def __init__(self, dataset_dir, render_cameras_name, object_cameras_name):
        self.data_dir = dataset_dir
        cams = np.load(os.path.join(dataset_dir, render_cameras_name))
        self.images_lis = sorted(glob(os.path.join(dataset_dir, "image/*.png")))
        self.n_images = len(self.images_lis)
        assert self.n_images > 0, f"no images under {dataset_dir}/image"

        from .dataset_util import read_image

        imgs = [read_image(p)[..., :3] for p in self.images_lis]
        self.masks_lis = sorted(glob(os.path.join(dataset_dir, "mask/*.png")))
        if self.masks_lis:
            masks = [read_image(p)[..., :1] for p in self.masks_lis]
        else:
            masks = [np.ones_like(im[..., :1]) for im in imgs]

        self.world_mats_np = [
            cams[f"world_mat_{i}"].astype(np.float32) for i in range(self.n_images)
        ]
        self.scale_mats_np = [
            cams[f"scale_mat_{i}"].astype(np.float32) for i in range(self.n_images)
        ]

        intrinsics_all, pose_all = [], []
        for scale_mat, world_mat in zip(self.scale_mats_np, self.world_mats_np):
            P = (world_mat @ scale_mat)[:3, :4]
            K, pose = decompose_projection(P)
            intr = np.eye(4, dtype=np.float32)
            intr[:3, :3] = K
            intrinsics_all.append(intr)
            pose_all.append(pose)

        self.intrinsics_all = jnp.asarray(np.stack(intrinsics_all))
        self.intrinsics_all_inv = jnp.asarray(
            np.stack([np.linalg.inv(m) for m in intrinsics_all])
        )
        self.pose_all = jnp.asarray(np.stack(pose_all))
        self.focal = float(self.intrinsics_all[0][0, 0])
        self.images = jnp.asarray(np.stack(imgs))  # [n, H, W, 3]
        self.masks = jnp.asarray(np.stack(masks))  # [n, H, W, 1]
        self.H, self.W = int(self.images.shape[1]), int(self.images.shape[2])
        self.image_pixels = self.H * self.W

        object_scale_mat = np.load(
            os.path.join(self.data_dir, object_cameras_name)
        )["scale_mat_0"]
        bb_min = np.array([-1.01, -1.01, -1.01, 1.0])
        bb_max = np.array([1.01, 1.01, 1.01, 1.0])
        inv0 = np.linalg.inv(self.scale_mats_np[0])
        self.object_bbox_min = (inv0 @ object_scale_mat @ bb_min[:, None])[:3, 0]
        self.object_bbox_max = (inv0 @ object_scale_mat @ bb_max[:, None])[:3, 0]
        self._rng = np.random.default_rng(0)

    # --------------------------------------------------------------- rays
    def _pixel_rays(self, img_idx, px, py):
        """Pixel coords [N] -> (rays_o [N,3], rays_v [N,3]) world space."""
        p = jnp.stack([px, py, jnp.ones_like(px)], axis=-1)  # [N, 3]
        p = p @ self.intrinsics_all_inv[img_idx, :3, :3].T
        rays_v = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
        rays_v = rays_v @ self.pose_all[img_idx, :3, :3].T
        rays_o = jnp.broadcast_to(self.pose_all[img_idx, :3, 3], rays_v.shape)
        return rays_o, rays_v

    def gen_rays_at(self, img_idx, resolution_level=1):
        """Full image rays, subsampled by resolution_level; [H', W', 3] x2."""
        lvl = resolution_level
        tx = jnp.linspace(0, self.W - 1, self.W // lvl)
        ty = jnp.linspace(0, self.H - 1, self.H // lvl)
        gx, gy = jnp.meshgrid(tx, ty, indexing="xy")
        rays_o, rays_v = self._pixel_rays(img_idx, gx.reshape(-1), gy.reshape(-1))
        shape = (self.H // lvl, self.W // lvl, 3)
        return rays_o.reshape(shape), rays_v.reshape(shape)

    def gen_random_rays_at(self, img_idx, batch_size):
        """Random pixels from one image -> [B, 10] (o, v, rgb, mask)."""
        px = self._rng.integers(0, self.W, batch_size)
        py = self._rng.integers(0, self.H, batch_size)
        color = self.images[img_idx][py, px]
        mask = self.masks[img_idx][py, px]
        rays_o, rays_v = self._pixel_rays(
            img_idx, jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32)
        )
        return jnp.concatenate([rays_o, rays_v, color, mask[:, :1]], axis=-1)

    def gen_rays_between(self, idx_0, idx_1, ratio, resolution_level=1):
        """Slerp-interpolated pose between two cameras (`:137-168`)."""
        from scipy.spatial.transform import Rotation as Rot
        from scipy.spatial.transform import Slerp

        lvl = resolution_level
        tx = jnp.linspace(0, self.W - 1, self.W // lvl)
        ty = jnp.linspace(0, self.H - 1, self.H // lvl)
        gx, gy = jnp.meshgrid(tx, ty, indexing="xy")
        p = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1).reshape(-1, 3)
        p = p @ self.intrinsics_all_inv[0, :3, :3].T
        rays_v = p / jnp.linalg.norm(p, axis=-1, keepdims=True)

        pose_0 = np.linalg.inv(np.asarray(self.pose_all[idx_0]))
        pose_1 = np.linalg.inv(np.asarray(self.pose_all[idx_1]))
        rots = Rot.from_matrix(np.stack([pose_0[:3, :3], pose_1[:3, :3]]))
        rot = Slerp([0, 1], rots)(ratio).as_matrix()
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot
        pose[:3, 3] = ((1.0 - ratio) * pose_0 + ratio * pose_1)[:3, 3]
        pose = np.linalg.inv(pose)
        rays_v = rays_v @ jnp.asarray(pose[:3, :3]).T
        rays_o = jnp.broadcast_to(jnp.asarray(pose[:3, 3]), rays_v.shape)
        shape = (self.H // lvl, self.W // lvl, 3)
        return rays_o.reshape(shape), rays_v.reshape(shape)

    @staticmethod
    def near_far_from_sphere(rays_o, rays_d):
        a = jnp.sum(rays_d ** 2, -1, keepdims=True)
        b = 2.0 * jnp.sum(rays_o * rays_d, -1, keepdims=True)
        mid = 0.5 * (-b) / a
        return mid - 1.0, mid + 1.0

    def image_at(self, idx, resolution_level):
        import cv2 as cv

        img = (np.asarray(self.images[idx]) * 255).astype(np.uint8)
        return cv.resize(
            img, (self.W // resolution_level, self.H // resolution_level)
        )
