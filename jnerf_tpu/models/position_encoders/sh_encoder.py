"""Spherical-harmonics view-direction encoder module (degree 4, 16 dims).

Parity target: `/root/reference/python/jnerf/models/position_encoders/sh_encoder/sh_encoder.py`.
Forward-only in the reference (grad returns None); here the closed-form
polynomials are trivially differentiable but the NGP pipeline feeds them
stop-gradiented directions anyway.
"""

from __future__ import annotations

from jnerf_tpu.ops.sh import sh_encode
from jnerf_tpu.utils.registry import ENCODERS


@ENCODERS.register_module()
class SHEncoder:
    def __init__(self, degree: int = 4):
        assert degree == 4, "reference SHEncoder always runs at degree 4 / 16 dims"
        self.degree = degree
        self.out_dim = 16
        self.compute_dtype = None

    def init(self, key):
        return {}

    def __call__(self, params, x):
        out = sh_encode(x, self.degree)
        if self.compute_dtype is not None:
            out = out.astype(self.compute_dtype)
        return out
