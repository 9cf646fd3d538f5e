"""Vanilla NeRF MLP (8x256, skip at 4, 128-wide view branch).

Parity target: `/root/reference/python/jnerf/models/networks/ori_nerf_network.py`.
Note the reference's skip quirk: the skip concat is ``[pos_feat, h]`` applied
*after* layer index 4's ReLU (so it feeds layer 5), which we reproduce.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import ENCODERS, NETWORKS, build_from_cfg
from .mlp import apply_linear, init_linear


@NETWORKS.register_module()
class OriginNeRFNetworks:
    def __init__(self, D=8, W=256, skips=(4,)):
        cfg = get_cfg()
        self.compute_dtype = jnp.bfloat16 if cfg.fp16 else jnp.float32
        self.D, self.W, self.skips = D, W, tuple(skips)
        self.pos_encoder = build_from_cfg(cfg.encoder.pos_encoder, ENCODERS)
        self.dir_encoder = build_from_cfg(cfg.encoder.dir_encoder, ENCODERS)
        in_dim = self.pos_encoder.out_dim
        self.pts_dims = [(in_dim, W)]
        for i in range(D - 1):
            self.pts_dims.append((W + in_dim, W) if i in self.skips else (W, W))

    def init(self, key):
        keys = jax.random.split(key, self.D + 4)
        pts = [
            init_linear(keys[i], d_in, d_out)
            for i, (d_in, d_out) in enumerate(self.pts_dims)
        ]
        return {
            "pts_linears": pts,
            "feature_linear": init_linear(keys[self.D], self.W, self.W),
            "alpha_linear": init_linear(keys[self.D + 1], self.W, 1),
            "views_linear": init_linear(
                keys[self.D + 2], self.dir_encoder.out_dim + self.W, self.W // 2
            ),
            "rgb_linear": init_linear(keys[self.D + 3], self.W // 2, 3),
        }

    def _trunk(self, params, pos_feat):
        h = pos_feat
        for i, p in enumerate(params["pts_linears"]):
            h = jax.nn.relu(apply_linear(p, h, self.compute_dtype))
            if i in self.skips:
                h = jnp.concatenate([pos_feat, h], axis=-1)
        return h

    def __call__(self, params, pos, dirs):
        dir_feat = self.dir_encoder({}, dirs)
        pos_feat = self.pos_encoder({}, pos)
        h = self._trunk(params, pos_feat)
        alpha = apply_linear(params["alpha_linear"], h, self.compute_dtype)
        feature = apply_linear(params["feature_linear"], h, self.compute_dtype)
        h = jnp.concatenate([feature, dir_feat], axis=-1)
        h = jax.nn.relu(apply_linear(params["views_linear"], h, self.compute_dtype))
        rgb = apply_linear(params["rgb_linear"], h, self.compute_dtype)
        return jnp.concatenate([rgb, alpha], axis=-1).astype(jnp.float32)

    def density(self, params, pos):
        pos_feat = self.pos_encoder({}, pos)
        h = self._trunk(params, pos_feat)
        return apply_linear(params["alpha_linear"], h, self.compute_dtype).astype(
            jnp.float32
        )
