"""Minimal functional MLP building blocks shared by the model zoo.

Params are plain dicts of jnp arrays (fp32 masters); ``apply``-style functions
cast to the caller's compute dtype so matmuls hit the MXU in bf16 with fp32
accumulation — the TPU replacement for the reference's fp16 AMP
(`ngp_network.py:71-75`).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True, dtype=jnp.float32):
    """He/Kaiming-uniform init (reference uses Jittor invariant_uniform)."""
    wkey, bkey = jax.random.split(key)
    bound = math.sqrt(6.0 / in_dim)
    p = {"w": jax.random.uniform(wkey, (in_dim, out_dim), dtype, -bound, bound)}
    if bias:
        bbound = math.sqrt(1.0 / in_dim)
        p["b"] = jax.random.uniform(bkey, (out_dim,), dtype, -bbound, bbound)
    return p


def apply_linear(p, x, compute_dtype=None, out_dtype=None):
    w = p["w"]
    if compute_dtype is not None:
        w = w.astype(compute_dtype)
        x = x.astype(compute_dtype)
    acc_dtype = out_dtype or jnp.float32
    y = jnp.dot(x, w, preferred_element_type=acc_dtype)
    if "b" in p:
        y = y + p["b"].astype(acc_dtype)
    return y


def init_mlp(key, dims: Sequence[int], bias: bool = True):
    """dims = [in, h1, ..., out]; returns list of linear param dicts."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        init_linear(k, dims[i], dims[i + 1], bias=bias)
        for i, k in enumerate(keys)
    ]


def apply_mlp(params, x, compute_dtype=None, final_activation=None):
    """ReLU-hidden MLP; final layer linear (optionally activated)."""
    n = len(params)
    for i, p in enumerate(params):
        x = apply_linear(p, x, compute_dtype)
        if i < n - 1:
            x = jax.nn.relu(x)
            if compute_dtype is not None:
                x = x.astype(compute_dtype)
    if final_activation is not None:
        x = final_activation(x)
    return x
