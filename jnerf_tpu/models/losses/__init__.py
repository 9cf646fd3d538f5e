"""Losses: Huber and MSE + PSNR helpers.

Parity targets: `/root/reference/python/jnerf/models/losses/{huber_loss,mse_loss}.py`.
Loss classes return elementwise values like the reference (the trainer takes
the mean; with Adam's scale invariance this matches the reference's
summed-backward + 128/n_rays loss-scale pipeline).
"""

from __future__ import annotations

import jax.numpy as jnp

from jnerf_tpu.utils.registry import LOSSES


def img2mse(x, y):
    return jnp.mean((x - y) ** 2)


def mse2psnr(mse):
    return -10.0 * jnp.log(mse) / jnp.log(10.0)


@LOSSES.register_module()
class HuberLoss:
    def __init__(self, delta):
        self.delta = delta

    def __call__(self, x, target):
        rel = jnp.abs(x - target)
        sqr = 0.5 / self.delta * rel * rel
        return jnp.where(rel > self.delta, rel - 0.5 * self.delta, sqr)


@LOSSES.register_module()
class MSELoss:
    def __call__(self, x, target):
        return (x - target) ** 2
