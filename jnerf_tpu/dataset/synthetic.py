"""Procedural blender-style test scene.

The reference test fixture (blender lego) is fetched over the network
(`/root/reference/python/jnerf/dataset/dataset_util.py:101-108`), which this
environment cannot do.  Instead we render a deterministic analytic scene —
opaque colored spheres on a transparent background — to the same on-disk
format (``transforms_{train,val,test}.json`` + RGBA PNGs), so every loader,
trainer and metric runs the exact code path real data would.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .dataset_util import write_image

# Scene definition in NeRF world space (cameras orbit at radius ~4).
# Spheres: (center xyz, radius, rgb color)
_SPHERES = [
    (np.array([0.0, 0.0, 0.0]), 0.55, np.array([0.85, 0.3, 0.25])),
    (np.array([0.6, 0.35, 0.3]), 0.3, np.array([0.25, 0.7, 0.35])),
    (np.array([-0.5, -0.2, 0.45]), 0.25, np.array([0.3, 0.4, 0.9])),
    (np.array([0.1, -0.55, -0.35]), 0.28, np.array([0.9, 0.8, 0.3])),
]
_LIGHT_DIR = np.array([0.5, 0.6, 0.62])


def _look_at_pose(eye: np.ndarray) -> np.ndarray:
    """Camera-to-world [3,4]; -z looks from eye at the origin (OpenGL/blender)."""
    fwd = -eye / np.linalg.norm(eye)  # viewing direction
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, fwd)
    # Blender convention: columns are [right, up, -view_dir], translation eye.
    m = np.stack([right, true_up, -fwd, eye], axis=1)
    return m.astype(np.float32)


def render_analytic(pose: np.ndarray, H: int, W: int, camera_angle_x: float) -> np.ndarray:
    """Ray-trace the sphere scene for one camera; returns RGBA float [H,W,4]."""
    focal = 0.5 * W / np.tan(0.5 * camera_angle_x)
    ys, xs = np.mgrid[0:H, 0:W]
    dirs_cam = np.stack(
        [
            (xs + 0.5 - W / 2) / focal,
            -(ys + 0.5 - H / 2) / focal,
            -np.ones_like(xs, dtype=np.float64),
        ],
        axis=-1,
    )
    R, t = pose[:, :3], pose[:, 3]
    dirs = dirs_cam @ R.T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = np.broadcast_to(t, dirs.shape)

    best_t = np.full((H, W), np.inf)
    rgb = np.zeros((H, W, 3))
    hit = np.zeros((H, W), bool)
    light = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)
    for center, radius, color in _SPHERES:
        oc = origin - center
        b = np.sum(oc * dirs, axis=-1)
        c = np.sum(oc * oc, axis=-1) - radius * radius
        disc = b * b - c
        valid = disc > 0
        t_hit = -b - np.sqrt(np.where(valid, disc, 0.0))
        valid &= (t_hit > 0) & (t_hit < best_t)
        p = origin + t_hit[..., None] * dirs
        n = (p - center) / radius
        shade = 0.35 + 0.65 * np.clip(np.sum(n * light, axis=-1), 0, 1)
        rgb = np.where(valid[..., None], color * shade[..., None], rgb)
        best_t = np.where(valid, t_hit, best_t)
        hit |= valid
    rgba = np.concatenate([rgb, hit[..., None].astype(np.float64)], axis=-1)
    return rgba.astype(np.float32)


def make_synthetic_scene(
    out_dir: str,
    n_train: int = 24,
    n_val: int = 2,
    n_test: int = 4,
    H: int = 128,
    W: int = 128,
    camera_angle_x: float = 0.6911112070083618,
    seed: int = 0,
) -> str:
    """Write the scene to disk in blender format; returns out_dir."""
    rng = np.random.default_rng(seed)
    os.makedirs(out_dir, exist_ok=True)

    def make_split(name, n, offset):
        frames = []
        split_dir = os.path.join(out_dir, name)
        os.makedirs(split_dir, exist_ok=True)
        for i in range(n):
            # Quasi-uniform orbit with jitter, elevation in [-25, 55] deg.
            theta = 2 * np.pi * (i / n + offset) + rng.uniform(-0.05, 0.05)
            phi = np.radians(rng.uniform(-25, 55))
            r = 4.0
            eye = r * np.array(
                [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
            )
            pose = _look_at_pose(eye)
            img = render_analytic(pose, H, W, camera_angle_x)
            rel = f"{name}/r_{i}.png"
            write_image(os.path.join(out_dir, rel), img)
            pose4 = np.concatenate([pose, [[0, 0, 0, 1]]], axis=0)
            frames.append(
                {"file_path": rel[: -len(".png")], "transform_matrix": pose4.tolist()}
            )
        with open(os.path.join(out_dir, f"transforms_{name}.json"), "w") as f:
            json.dump(
                {"camera_angle_x": camera_angle_x, "aabb_scale": 1, "frames": frames},
                f,
            )

    make_split("train", n_train, 0.0)
    make_split("val", n_val, 0.37)
    make_split("test", n_test, 0.11)
    return out_dir


# --------------------------------------------------------------------- NeuS
_NEUS_SPHERES = [
    (np.array([0.0, 0.0, -0.1]), 0.45, np.array([0.8, 0.45, 0.3])),
    (np.array([0.0, 0.0, 0.42]), 0.22, np.array([0.35, 0.55, 0.8])),
]


def neus_sdf(pts: np.ndarray) -> np.ndarray:
    """Analytic SDF of the NeuS test scene (union of spheres); for tests."""
    d = np.full(pts.shape[:-1], np.inf)
    for center, radius, _ in _NEUS_SPHERES:
        d = np.minimum(d, np.linalg.norm(pts - center, axis=-1) - radius)
    return d


def make_synthetic_neus_scene(out_dir: str, n_images: int = 12, H: int = 96,
                              W: int = 96, seed: int = 0) -> str:
    """Write a DTU-format scene (cameras_sphere.npz + image/ + mask/) of an
    analytic two-sphere object inside the unit sphere."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    focal = 1.2 * max(H, W)
    K = np.array(
        [[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float64
    )
    light = _LIGHT_DIR / np.linalg.norm(_LIGHT_DIR)
    cams = {}
    for i in range(n_images):
        theta = 2 * np.pi * i / n_images + rng.uniform(-0.05, 0.05)
        phi = np.radians(rng.uniform(-10, 45))
        eye = 3.0 * np.array(
            [np.cos(theta) * np.cos(phi), np.sin(theta) * np.cos(phi), np.sin(phi)]
        )
        # Camera looks at origin; +z camera axis = viewing direction (OpenCV).
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        dn = np.cross(fwd, right)
        R_w2c = np.stack([right, dn, fwd], axis=0)  # rows
        t = -R_w2c @ eye
        world_mat = np.eye(4)
        world_mat[:3, :] = K @ np.concatenate([R_w2c, t[:, None]], axis=1)
        cams[f"world_mat_{i}"] = world_mat.astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)

        # Ray-trace the spheres through the OpenCV camera.
        ys, xs = np.mgrid[0:H, 0:W]
        d_cam = np.stack(
            [(xs + 0.5 - W / 2) / focal, (ys + 0.5 - H / 2) / focal,
             np.ones_like(xs, np.float64)], axis=-1,
        )
        dirs = d_cam @ np.stack([right, dn, fwd], axis=0)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        origin = np.broadcast_to(eye, dirs.shape)
        best_t = np.full((H, W), np.inf)
        rgb = np.full((H, W, 3), 0.05)
        hit = np.zeros((H, W), bool)
        for center, radius, color in _NEUS_SPHERES:
            oc = origin - center
            b = np.sum(oc * dirs, axis=-1)
            c = np.sum(oc * oc, axis=-1) - radius * radius
            disc = b * b - c
            valid = disc > 0
            t_hit = -b - np.sqrt(np.where(valid, disc, 0.0))
            valid &= (t_hit > 0) & (t_hit < best_t)
            p = origin + t_hit[..., None] * dirs
            nrm = (p - center) / radius
            shade = 0.35 + 0.65 * np.clip(np.sum(nrm * light, axis=-1), 0, 1)
            rgb = np.where(valid[..., None], color * shade[..., None], rgb)
            best_t = np.where(valid, t_hit, best_t)
            hit |= valid
        write_image(os.path.join(out_dir, "image", f"{i:03d}.png"),
                    rgb.astype(np.float32))
        write_image(os.path.join(out_dir, "mask", f"{i:03d}.png"),
                    np.repeat(hit[..., None].astype(np.float32), 3, axis=-1))
    np.savez(os.path.join(out_dir, "cameras_sphere.npz"), **cams)
    return out_dir
