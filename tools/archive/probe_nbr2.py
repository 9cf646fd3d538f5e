"""Decompose the nbr16 hash forward at NGP scale (chained in-jit timing):
build_nbr_table / index+weights / bare gather / blend+matmul / full fwd /
fwd+bwd.  Usage: python tools/probe_nbr2.py [section ...]"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as H

key = jax.random.PRNGKey(0)
N = 1 << 18
spec = HashGridSpec(n_levels=16, log2_hashmap_size=19, max_level_size=1 << 18)
L = spec.n_levels
print(f"spec: {spec.n_entries} entries, {L} levels, N={N}", flush=True)
print("level sizes:", spec.level_sizes, flush=True)

table = jax.random.normal(key, (spec.n_entries, 2), jnp.float32) * 0.1
pos = jax.random.uniform(key, (N, 3), jnp.float32)
nbr0 = jax.jit(lambda t: H.build_nbr_table(spec, t.astype(H.GATHER_DTYPE)))(table)
idx0 = jax.jit(lambda p: H._entry_indices(spec, p)[0])(pos)
idx0 = jax.block_until_ready(idx0)
nbr0 = jax.block_until_ready(nbr0)


def chained(name, body, carry, args, reps=4, denom=N * L):
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
    print(f"{name}: {t*1e3:.2f} ms ({t / denom * 1e9:.2f} ns/unit)", flush=True)


def jitter(c, x):
    return x + c.reshape(-1)[0].astype(x.dtype) * jnp.asarray(1e-9, x.dtype)


which = sys.argv[1:] or ["build", "idxw", "gather", "fullpre", "full", "bwd"]

if "build" in which:
    def f(c, table):
        nbr = H.build_nbr_table(spec, jitter(c, table).astype(H.GATHER_DTYPE))
        return nbr[:1].astype(jnp.float32)
    chained("build_nbr_table", f, jnp.zeros((1, 16), jnp.float32), (table,),
            denom=spec.n_entries)

if "idxw" in which:
    def f(c, pos):
        idx, fr = H._entry_indices(spec, jitter(c, pos))
        return fr[0][:1, :] + idx[:1, :].astype(jnp.float32)
    chained("index+weights", f, jnp.zeros((1, 16), jnp.float32), (pos,))

if "gather" in which:
    def f(c, nbr, idx):
        # jitter indices by the carry so scan iterations stay dependent
        i = (idx + c.reshape(-1)[0].astype(jnp.int32)) % nbr.shape[0]
        rows = jnp.take(nbr, i, axis=0)
        return rows[:1].astype(jnp.float32)
    chained("bare row gather [N*L,16]", f, jnp.zeros((1, 16), jnp.float32),
            (nbr0, idx0))

if "fullpre" in which:
    def f(c, nbr, pos):
        out = H.hash_encode_nbr(spec, table, jitter(c, pos), nbr=nbr)
        return out[:1]
    chained("fwd w/ prebuilt nbr", f, jnp.zeros((1, 2 * L), jnp.float32),
            (nbr0, pos))

if "full" in which:
    def f(c, table, pos):
        out = H.hash_encode_nbr(spec, table, jitter(c, pos))
        return out[:1]
    chained("full fwd", f, jnp.zeros((1, 2 * L), jnp.float32), (table, pos))

if "bwd" in which:
    def f(c, table, pos):
        g = jax.grad(
            lambda t: jnp.mean(H.hash_encode_nbr(spec, t, jitter(c, pos)) ** 2)
        )(table)
        return g[:1]
    chained("fwd+bwd", f, jnp.zeros((1, 2), jnp.float32), (table, pos))
