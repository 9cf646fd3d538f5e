"""Optimizers: Adam, ExpDecay LR wrapper, and the in-place EMA smoother.

Parity targets: `/root/reference/python/jnerf/optims/{adam,expdecay,ema}.py`.
Built as optax gradient transformations over fp32 master params:

- ``Adam`` -> optax.adam with the reference's eps placement (added after
  the sqrt, matching Jittor nn.Adam).
- ``ExpDecay`` wraps a nested optimizer with the step-function LR schedule
  ``lr * decay_base ** n_decays(step)`` (`expdecay.py:20-25`).
- ``EMA`` reproduces the reference's unusual semantics exactly
  (`ema.py:26-37`): each step the *live* params are replaced by the
  debiased exponential moving average and the shadow copies the result, so
  training continues from smoothed parameters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from jnerf_tpu.utils.registry import OPTIMS


@OPTIMS.register_module()
class Adam:
    def __init__(self, lr, eps=1e-8, betas=(0.9, 0.999)):
        self.lr = lr
        self.eps = eps
        self.betas = tuple(betas)

    def make(self, lr_schedule=None) -> optax.GradientTransformation:
        lr = self.lr if lr_schedule is None else lr_schedule
        return optax.adam(lr, b1=self.betas[0], b2=self.betas[1], eps=self.eps)


@OPTIMS.register_module()
class ExpDecay:
    def __init__(
        self,
        nested_optimizer,
        decay_start: int,
        decay_interval: int,
        decay_base: float,
        decay_end=None,
    ):
        self.nested = nested_optimizer
        self.decay_start = decay_start
        self.decay_interval = decay_interval
        self.decay_base = decay_base
        self.decay_end = 10_000_000 if decay_end is None else decay_end

    def schedule(self, step):
        """LR factor as a jittable function of the step counter."""
        step = jnp.minimum(step, self.decay_end)
        n = jnp.where(
            step >= self.decay_start,
            (step - self.decay_start) // self.decay_interval + 1,
            0,
        )
        return self.nested.lr * self.decay_base ** n.astype(jnp.float32)

    def make(self) -> optax.GradientTransformation:
        return self.nested.make(lr_schedule=self.schedule)


@OPTIMS.register_module()
class EMA:
    def __init__(self, decay):
        self.decay = decay

    def init(self, params):
        return {"shadow": jax.tree.map(jnp.copy, params), "steps": jnp.zeros((), jnp.int32)}

    def step(self, params, state):
        """Returns (smoothed_params, new_state); both live and shadow move."""
        steps = state["steps"] + 1
        d = self.decay
        debias_old = 1.0 - d ** (steps.astype(jnp.float32) - 1.0)
        debias_new = 1.0 / (1.0 - d ** steps.astype(jnp.float32))
        new_params = jax.tree.map(
            lambda p, v: ((1.0 - d) * p + d * v * debias_old) * debias_new,
            params,
            state["shadow"],
        )
        return new_params, {"shadow": new_params, "steps": steps}

from .linearlog import LinearLog  # noqa: F401
from .svox2_optim import PlenOptim  # noqa: F401
