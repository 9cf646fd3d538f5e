"""Plenoxels two-group optimizers: SGD on density, RMSprop on SH.

Parity target: `/root/reference/contrib/plenoxel/python/jnerf/optims/svox2_optim.py`
(PlenOptim/PlenOptimSGD/PlenOptimRMSprop :4-77) and svox2's delayed
exponential LR schedule (`svox2_utils.py:532-…`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.utils.registry import OPTIMS


def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=250000):
    """svox2's get_expon_lr_func: log-lerp with optional sine-eased delay."""
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    return delay * jnp.exp(np.log(lr_init) * (1 - t) + np.log(lr_final) * t)


@OPTIMS.register_module()
class PlenOptim:
    """Per-group plain SGD (density) + RMSprop (SH), per-step LRs supplied
    by the runner's schedules."""

    def __init__(self, rms_beta=0.95):
        self.rms_beta = rms_beta

    @staticmethod
    def _keys(params):
        # dense grids use {density, sh}; the sparse 512^3 path uses
        # {density_data, sh_data} tables — same optimizer semantics.
        dk = "density" if "density" in params else "density_data"
        sk = "sh" if "sh" in params else "sh_data"
        return dk, sk

    def init(self, params):
        _, sk = self._keys(params)
        return {"sh_rms": jax.tree.map(jnp.zeros_like, params[sk])
                if isinstance(params[sk], dict)
                else jnp.zeros_like(params[sk])}

    def step(self, params, grads, state, lr_sigma, lr_sh):
        dk, sk = self._keys(params)
        density = params[dk] - lr_sigma * grads[dk]
        b = self.rms_beta
        rms = b * state["sh_rms"] + (1 - b) * grads[sk] ** 2
        sh = params[sk] - lr_sh * grads[sk] / (jnp.sqrt(rms) + 1e-8)
        return {dk: density, sk: sh}, {"sh_rms": rms}
