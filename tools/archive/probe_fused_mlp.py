"""Time the fused Pallas NGP MLP vs the XLA dot chain at bench scale.

Isolates the MLP tier (pos/dir features precomputed): fwd and fwd+bwd for
both paths, N = 2^18.  Timing per the measured relay rules: async rep
loops with a scalar fetch to force completion.
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

from jnerf_tpu.ops import fused_mlp as fm

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
shapes = [(fm.D_IN, fm.D_HID), (fm.D_HID, fm.D_GEO),
          (fm.RGB_IN, fm.D_HID), (fm.D_HID, fm.D_HID), (fm.D_HID, 3)]
weights = tuple(
    jax.random.normal(k, s, jnp.float32) * 0.1 for k, s in zip(ks, shapes)
)
N = 1 << 18
x = jax.random.uniform(ks[5], (N, fm.D_IN), jnp.float32, -1, 1)
d = jax.random.uniform(ks[6], (N, fm.SH_DIM), jnp.float32, -1, 1)
g = jax.random.normal(ks[7], (N, 4), jnp.float32)


def jnp_forward(w, xx, dd):
    from jnerf_tpu.models.networks.mlp import apply_mlp

    den = [{"w": w[0]}, {"w": w[1]}]
    rgbp = [{"w": w[2]}, {"w": w[3]}, {"w": w[4]}]
    dens = apply_mlp(den, xx, jnp.bfloat16)
    h = jnp.concatenate(
        [dens.astype(jnp.bfloat16), dd.astype(jnp.bfloat16)], axis=-1)
    rgb = apply_mlp(rgbp, h, jnp.bfloat16)
    return jnp.concatenate([rgb, dens[..., :1]], axis=-1).astype(jnp.float32)


def _sync(out):
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=20):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    t = (time.perf_counter() - t0) / reps
    print(f"{name}: {t*1e3:.2f} ms", flush=True)


which = sys.argv[1:] or ["jf", "ff", "jg", "fg"]

if "jf" in which:
    timeit("jnp fwd      ", jax.jit(jnp_forward), weights, x, d)
if "ff" in which:
    timeit("fused fwd    ", jax.jit(fm.fused_ngp_mlp), weights, x, d)
if "jg" in which:
    jg = jax.jit(jax.grad(
        lambda w, xx: jnp.vdot(jnp_forward(w, xx, d), g), argnums=(0, 1)))
    timeit("jnp fwd+bwd  ", jg, weights, x)
if "fg" in which:
    fg = jax.jit(jax.grad(
        lambda w, xx: jnp.vdot(fm.fused_ngp_mlp(w, xx, d), g),
        argnums=(0, 1)))
    timeit("fused fwd+bwd", fg, weights, x)
if "fd" in which:
    timeit("fused density", jax.jit(fm.fused_density_mlp),
           weights[0], weights[1], x)
