"""Mip-NeRF's log-linear LR schedule with delayed warmup.

Parity target: `/root/reference/contrib/mipnerf/python/jnerf/optims/linearlog.py`
(the standard mip-NeRF ``lr = exp(lerp(log(init), log(end), t))`` scaled by
a sine-eased delay multiplier).
"""

from __future__ import annotations

import jax.numpy as jnp

from jnerf_tpu.utils.registry import OPTIMS


@OPTIMS.register_module()
class LinearLog:
    def __init__(self, nested_optimizer, end_lr, max_steps, lr_delay_steps=0,
                 lr_delay_mult=1.0):
        self.nested = nested_optimizer
        self.init_lr = nested_optimizer.lr
        self.end_lr = end_lr
        self.max_steps = max_steps
        self.lr_delay_steps = lr_delay_steps
        self.lr_delay_mult = lr_delay_mult

    def schedule(self, step):
        step = jnp.asarray(step, jnp.float32)
        if self.lr_delay_steps > 0:
            delay_rate = self.lr_delay_mult + (1 - self.lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / self.lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / self.max_steps, 0, 1)
        log_lerp = jnp.exp(
            jnp.log(self.init_lr) * (1 - t) + jnp.log(self.end_lr) * t
        )
        return delay_rate * log_lerp

    def make(self):
        return self.nested.make(lr_schedule=self.schedule)
