"""pixelNeRF: image-conditioned NeRF from few reference views.

Parity target: `/root/reference/contrib/pixelnerf/` (Network.py :5-94 —
PE(L=6, w=1.5) + 512-wide ResMLP blocks with per-block image-feature
injection and mean over references; Render.py :3-48 — coarse stratified
rendering; ImageEncoder.py — multi-scale conv features upsampled and
concatenated; Dataset.py — feature projection).

TPU-first: the reference's pretrained torch resnet34 is replaced by a
from-scratch conv pyramid (pretrained weights are unfetchable here and the
reference's own readme notes training end-to-end).  Convs run NHWC through
lax.conv_general_dilated; everything jits.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def positional_encoding(x, L, w=1.5):
    """PE from Network.py:5-11: [x, sin(2^i w x), cos(2^i w x)...]."""
    outs = [x]
    for i in range(L):
        outs.append(jnp.sin(2.0 ** i * x * w))
        outs.append(jnp.cos(2.0 ** i * x * w))
    return jnp.concatenate(outs, axis=-1)


# ----------------------------------------------------------- image encoder
def _conv_init(key, k, cin, cout):
    fan_in = k * k * cin
    bound = math.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, (k, k, cin, cout), jnp.float32, -bound, bound)


def _conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class ImageEncoder:
    """Multi-scale conv features: stages of [64, 64, 128, 256] channels,
    bilinearly upsampled to the stage-1 resolution and concatenated to a
    512-channel map at half input resolution (mirroring ImageEncoder.py)."""

    STAGES = (64, 64, 128, 256)

    def __init__(self):
        self.out_channels = sum(self.STAGES)  # 512

    def init(self, key):
        keys = jax.random.split(key, 1 + 2 * len(self.STAGES))
        params = {"stem": _conv_init(keys[0], 7, 3, self.STAGES[0])}
        cin = self.STAGES[0]
        for i, cout in enumerate(self.STAGES):
            params[f"conv{i}a"] = _conv_init(keys[1 + 2 * i], 3, cin, cout)
            params[f"conv{i}b"] = _conv_init(keys[2 + 2 * i], 3, cout, cout)
            cin = cout
        return params

    def __call__(self, params, images):
        """images [B, H, W, 3] in [0,1] -> features [B, H/2, W/2, 512]."""
        x = _conv(images * 2.0 - 1.0, params["stem"], stride=2)
        x = jax.nn.relu(x)
        feats = []
        target_hw = x.shape[1:3]
        for i in range(len(self.STAGES)):
            stride = 1 if i == 0 else 2
            y = jax.nn.relu(_conv(x, params[f"conv{i}a"], stride=stride))
            y = jax.nn.relu(_conv(y, params[f"conv{i}b"]))
            x = y
            feats.append(
                jax.image.resize(
                    y, (y.shape[0],) + target_hw + (y.shape[-1],), "bilinear"
                )
            )
        return jnp.concatenate(feats, axis=-1)


def bilinear_sample(feat, uv):
    """feat [H, W, C]; uv [N, 2] in pixel coords of feat -> [N, C]."""
    H, W, _ = feat.shape
    u = jnp.clip(uv[:, 0], 0.0, W - 1.001)
    v = jnp.clip(uv[:, 1], 0.0, H - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = (u - u0)[:, None]
    fv = (v - v0)[:, None]
    flat = feat.reshape(H * W, -1)

    def at(vv, uu):
        return jnp.take(flat, vv * W + uu, axis=0)

    return (
        at(v0, u0) * (1 - fu) * (1 - fv)
        + at(v0, u0 + 1) * fu * (1 - fv)
        + at(v0 + 1, u0) * (1 - fu) * fv
        + at(v0 + 1, u0 + 1) * fu * fv
    )


# ---------------------------------------------------------------- network
class PixelNeRF:
    """PE -> 512 trunk; 3 ResMLP blocks with image-feature injection; mean
    over references; 2 plain ResMLP blocks; (rgb, sigma) head."""

    def __init__(self, img_f_ch=512, net_width=512, L_pos=6, L_dir=0, w=1.5):
        self.img_f_ch = img_f_ch
        self.net_width = net_width
        self.L_pos, self.L_dir, self.w = L_pos, L_dir, w
        self.in_ch = (3 + 6 * L_pos) + (3 + 6 * L_dir)

    def _lin(self, key, i, o):
        bound = math.sqrt(6.0 / i)
        k1, k2 = jax.random.split(key)
        return {
            "w": jax.random.uniform(k1, (i, o), jnp.float32, -bound, bound),
            "b": jnp.zeros((o,)),
        }

    def init(self, key):
        keys = jax.random.split(key, 20)
        W = self.net_width
        params = {"stem": self._lin(keys[0], self.in_ch, W)}
        for i in range(3):
            params[f"f1_{i}"] = {
                "img": self._lin(keys[1 + 3 * i], self.img_f_ch, W),
                "a": self._lin(keys[2 + 3 * i], W, W),
                "b": self._lin(keys[3 + 3 * i], W, W),
            }
        for i in range(2):
            params[f"f2_{i}"] = {
                "a": self._lin(keys[10 + 2 * i], W, W),
                "b": self._lin(keys[11 + 2 * i], W, W),
            }
        params["final"] = self._lin(keys[15], W, 4)
        return params

    @staticmethod
    def _apply(p, x):
        return x @ p["w"] + p["b"]

    def _resmlp(self, p, x, img_f=None):
        if img_f is not None:
            x = x + jax.nn.relu(self._apply(p["img"], img_f))
        h = jax.nn.relu(self._apply(p["a"], x))
        h = jax.nn.relu(self._apply(p["b"], h))
        return h + x

    def __call__(self, params, img_feature, x, d):
        """img_feature [n_ref, R, S, C]; x [R, S, 3]; d [R, 3] ->
        (rgb [R, S, 3], sigma [R, S])."""
        n_ref = img_feature.shape[0]
        x_enc = positional_encoding(x, self.L_pos, self.w)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        d_enc = positional_encoding(d, self.L_dir, self.w)
        d_enc = jnp.broadcast_to(d_enc[:, None, :], x.shape[:2] + (d_enc.shape[-1],))
        xd = jnp.concatenate([x_enc, d_enc], axis=-1)[None]
        f = jax.nn.relu(self._apply(params["stem"], xd))
        f = jnp.broadcast_to(f, (n_ref,) + f.shape[1:])
        for i in range(3):
            f = self._resmlp(params[f"f1_{i}"], f, img_feature)
        f = f.mean(axis=0)
        for i in range(2):
            f = self._resmlp(params[f"f2_{i}"], f)
        out = self._apply(params["final"], f)
        return jax.nn.sigmoid(out[..., 1:]), jax.nn.relu(out[..., 0])


def render_rays_pixelnerf(net, params, rays_o, rays_d, bound, n_samples,
                          feature_fn, key=None):
    """Coarse-only stratified rendering (Render.py:3-48).

    feature_fn(pts [R, S, 3]) -> [n_ref, R, S, C] projected features.
    """
    near, far = bound
    if key is not None:
        k = jax.random.uniform(key, (n_samples,)) / n_samples
    else:
        k = 0.5 / n_samples
    base = jnp.linspace(0.0, 1.0, n_samples + 1)[:-1]
    z_vals = near + (far - near) * (base + k)  # [S]
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[None, :, None]

    feats = feature_fn(pts)
    rgb, sigma = net(params, feats, pts, rays_d)

    delta = jnp.diff(z_vals)
    delta = jnp.concatenate([delta, jnp.asarray([1e10])])
    delta = delta[None, :] * jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    alpha = 1.0 - jnp.exp(-sigma * delta)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1 - alpha + 1e-7], -1), -1
    )[:, :-1]
    w = alpha * trans
    rgb_map = jnp.sum(w[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(w * z_vals[None, :], -1)
    acc_map = jnp.sum(w, -1)
    return rgb_map, depth_map, acc_map
