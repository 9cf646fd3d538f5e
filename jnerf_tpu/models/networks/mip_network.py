"""Mip-NeRF MLP: one network shared across coarse/fine levels.

Parity target: `/root/reference/contrib/mipnerf/python/jnerf/models/networks/mip_network.py`
(8x256 trunk with skip every ``skip_layer`` layers, density head, bottleneck
+ viewdir-conditioned 1x128 color branch).  Config keys match ``mip_base.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import NETWORKS
from .mlp import apply_linear, init_linear


@NETWORKS.register_module()
class MipNerfMLP:
    def __init__(self):
        cfg = get_cfg()
        self.net_depth = cfg.net_depth or 8
        self.net_width = cfg.net_width or 256
        self.skip_layer = cfg.skip_layer or 4
        self.net_depth_condition = cfg.net_depth_condition or 1
        self.net_width_condition = cfg.net_width_condition or 128
        self.num_density_channels = cfg.num_density_channels or 1
        self.num_rgb_channels = cfg.num_rgb_channels or 3
        self.use_viewdirs = bool(cfg.use_viewdirs)
        # IPE over degrees [min_deg_point, max_deg_point): 2 (sin,cos) x 3.
        self.in_dim = 2 * 3 * (cfg.max_deg_point - cfg.min_deg_point)
        # viewdir pos_enc with identity append.
        self.view_dim = 3 + 2 * 3 * cfg.deg_view

    def init(self, key):
        keys = jax.random.split(key, self.net_depth + self.net_depth_condition + 4)
        trunk = []
        in_dim = self.in_dim
        for i in range(self.net_depth):
            trunk.append(init_linear(keys[i], in_dim, self.net_width))
            in_dim = self.net_width
            if i % self.skip_layer == 0 and i > 0:
                in_dim = self.net_width + self.in_dim
        k = self.net_depth
        params = {
            "trunk": trunk,
            "density": init_linear(keys[k], self.net_width, self.num_density_channels),
            "bottleneck": init_linear(keys[k + 1], self.net_width, self.net_width),
        }
        cond = []
        in_dim = self.net_width + self.view_dim
        for i in range(self.net_depth_condition):
            cond.append(init_linear(keys[k + 2 + i], in_dim, self.net_width_condition))
            in_dim = self.net_width_condition
        params["condition"] = cond
        params["rgb"] = init_linear(
            keys[k + 2 + self.net_depth_condition], in_dim, self.num_rgb_channels
        )
        return params

    def __call__(self, params, samples_enc, viewdirs_enc):
        """samples_enc [R, S, F], viewdirs_enc [R, Fv] -> (raw_rgb, raw_density)."""
        r, s, _ = samples_enc.shape
        x = samples_enc.reshape(r * s, -1)
        inputs = x
        for i, p in enumerate(params["trunk"]):
            x = jax.nn.relu(apply_linear(p, x))
            if i % self.skip_layer == 0 and i > 0:
                x = jnp.concatenate([x, inputs], axis=-1)
        raw_density = apply_linear(params["density"], x).reshape(
            r, s, self.num_density_channels
        )
        if self.use_viewdirs:
            bottleneck = apply_linear(params["bottleneck"], x)
            cond = jnp.repeat(viewdirs_enc, s, axis=0)
            x = jnp.concatenate([bottleneck, cond], axis=-1)
            for p in params["condition"]:
                x = jax.nn.relu(apply_linear(p, x))
        raw_rgb = apply_linear(params["rgb"], x).reshape(r, s, self.num_rgb_channels)
        return raw_rgb, raw_density
