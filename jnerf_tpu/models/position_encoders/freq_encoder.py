"""Classic NeRF sin/cos positional encoding.

Parity target: `/root/reference/python/jnerf/models/position_encoders/freq_encoder/freq_encoder.py`.
Stateless (no parameters); ``__call__(params, x)`` keeps the uniform encoder
interface but ignores ``params``.
"""

from __future__ import annotations

import jax.numpy as jnp

from jnerf_tpu.utils.registry import ENCODERS


@ENCODERS.register_module()
class FrequencyEncoder:
    def __init__(self, multires, include_input=True, input_dims=3, log_sampling=True):
        self.multires = multires
        self.include_input = include_input
        self.input_dims = input_dims
        if log_sampling:
            freqs = 2.0 ** jnp.linspace(0.0, multires - 1, multires)
        else:
            freqs = jnp.linspace(2.0 ** 0.0, 2.0 ** (multires - 1), multires)
        self.freq_bands = freqs
        self.out_dim = input_dims * (2 * multires + (1 if include_input else 0))

    def init(self, key):
        return {}

    def __call__(self, params, x):
        # [..., D] -> [..., D * (include + 2*multires)]; per-frequency blocks
        # are [sin, cos] pairs, matching the reference's embed_fns order.
        xb = x[..., None, :] * self.freq_bands[:, None]  # [..., F, D]
        enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)  # [..., F, 2, D]
        parts = [x] if self.include_input else []
        parts.append(enc.reshape(*x.shape[:-1], -1))
        return jnp.concatenate(parts, axis=-1)
