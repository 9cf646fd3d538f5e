"""Dataset helper math: NGP scale constant, fov/focal, sRGB conversion, image IO.

Parity target: `/root/reference/python/jnerf/dataset/dataset_util.py`.
The lego auto-downloader is intentionally absent (this environment has no
egress); point ``dataset_dir`` at a local copy instead, or use
``jnerf_tpu.dataset.synthetic`` to generate a procedural test scene.
"""

from __future__ import annotations

import math
import os
import struct

import numpy as np

# Poses are scaled by this factor (and offset by 0.5) into NGP's unit cube.
NERF_SCALE = 0.33


def fov_to_focal_length(resolution: int, degrees: float) -> float:
    return 0.5 * resolution / math.tan(0.5 * math.radians(degrees))


def focal_length_to_fov(resolution: int, focal_length: float) -> float:
    return 2.0 * math.degrees(math.atan(0.5 * resolution / focal_length))


def srgb_to_linear(img):
    limit = 0.04045
    return np.where(img > limit, np.power((img + 0.055) / 1.055, 2.4), img / 12.92)


def linear_to_srgb(img):
    limit = 0.0031308
    return np.where(img > limit, 1.055 * (img ** (1.0 / 2.4)) - 0.055, 12.92 * img)


def read_image(path: str) -> np.ndarray:
    """Read an image to float32 in [0,1], shape [H, W, C].

    ``.bin`` files are raw fp16 RGBA with a (h, w) int32 header, as produced
    by the reference's ``write_image`` (`dataset_util.py:57-87`).
    """
    if os.path.splitext(path)[1] == ".bin":
        with open(path, "rb") as f:
            raw = f.read()
        h, w = struct.unpack("ii", raw[:8])
        return (
            np.frombuffer(raw, dtype=np.float16, count=h * w * 4, offset=8)
            .astype(np.float32)
            .reshape([h, w, 4])
        )
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(path)).astype(np.float32)
    if img.ndim == 2:
        img = img[:, :, None]
    return img / 255.0


def write_image(path: str, img: np.ndarray, quality: int = 95) -> None:
    import imageio.v2 as imageio

    img = np.asarray(img)
    if os.path.splitext(path)[1] == ".bin":
        if img.shape[2] < 4:
            pad = np.ones([img.shape[0], img.shape[1], 4 - img.shape[2]], img.dtype)
            img = np.concatenate([img, pad], axis=-1)
        with open(path, "wb") as f:
            f.write(struct.pack("ii", img.shape[0], img.shape[1]))
            f.write(img.astype(np.float16).tobytes())
        return
    out = (np.clip(img, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
    kwargs = {}
    if os.path.splitext(path)[1].lower() in (".jpg", ".jpeg"):
        out = out[..., :3]
        kwargs["quality"] = quality
    imageio.imwrite(path, out, **kwargs)
