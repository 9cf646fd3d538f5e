"""Measure the round-2 hash path (ops/hash_nbr) vs round-1
(ops/hash_grid_rows) at NGP scale on the bench chip: fwd, and fwd+bwd."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops.hash_grid_rows import hash_encode_rows
from jnerf_tpu.ops.hash_nbr import hash_encode_nbr

key = jax.random.PRNGKey(0)
N = 1 << 18  # 262144 samples (NGP target batch)
spec = HashGridSpec(n_levels=16, log2_hashmap_size=19)
print(f"spec: {spec.n_entries} entries, {spec.n_levels} levels", flush=True)


def chained(name, body, carry, args, reps=4):
    @jax.jit
    def run(c, *a):
        def f(c, _):
            return body(c, *a), None
        out, _ = jax.lax.scan(f, c, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    _ = float(run(carry, *args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(carry, *args))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / reps
    per = t / (N * spec.n_levels) * 1e9
    print(f"{name}: {t*1e3:.2f} ms ({per:.2f} ns per sample-level)", flush=True)


table = jax.random.normal(key, (spec.n_entries, 2), jnp.float32) * 0.1
pos = jax.random.uniform(key, (N, 3), jnp.float32)

which = sys.argv[1:] or ["nbr_fwd", "nbr_bwd", "rows_fwd", "rows_bwd"]


def jitter(c, pos):
    # cheap data dependence so scan iterations can't collapse
    return jnp.clip(pos + c[0, 0] * 1e-9, 0.0, 1.0)


if "nbr_fwd" in which:
    def f(c, table, pos):
        out = hash_encode_nbr(spec, table, jitter(c, pos))
        return out[:1]
    chained("nbr fwd", f, jnp.zeros((1, 32), jnp.float32), (table, pos))

if "nbr_bwd" in which:
    def f(c, table, pos):
        g = jax.grad(
            lambda t: jnp.mean(hash_encode_nbr(spec, t, jitter(c, pos)) ** 2)
        )(table)
        return g[:1]
    chained("nbr fwd+bwd", f, jnp.zeros((1, 2), jnp.float32), (table, pos))

if "rows_fwd" in which:
    def f(c, table, pos):
        out = hash_encode_rows(spec, table, jitter(c, pos))
        return out[:1]
    chained("rows fwd", f, jnp.zeros((1, 32), jnp.float32), (table, pos))

if "rows_bwd" in which:
    def f(c, table, pos):
        g = jax.grad(
            lambda t: jnp.mean(hash_encode_rows(spec, t, jitter(c, pos)) ** 2)
        )(table)
        return g[:1]
    chained("rows fwd+bwd", f, jnp.zeros((1, 2), jnp.float32), (table, pos))
