"""Characterize XLA row-gather rate vs table row-count, row width, dtype,
and index order.  N=4.2M gathered rows (NGP scale), chained in-jit."""

import sys
import time
import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
N = 1 << 22


def chained(name, body, carry, args, reps=4, items=N):
    @jax.jit
    def run(c, *a):
        def f(c, _):
            return body(c, *a), None
        out, _ = jax.lax.scan(f, c, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    try:
        _ = float(run(carry, *args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(carry, *args))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / reps
        print(f"{name}: {t*1e3:.2f} ms -> {t/items*1e9:.2f} ns/row", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


def gtest(name, n_rows, width, dtype, sort=False):
    tbl = (jax.random.normal(key, (n_rows, width), jnp.float32) * 0.1).astype(dtype)
    idx = jax.random.randint(key, (N,), 0, n_rows, jnp.int32)
    if sort:
        idx = jnp.sort(idx)

    def f(c, tbl, idx):
        i = (idx + c[0, 0].astype(jnp.int32)) % tbl.shape[0]
        return jnp.take(tbl, i, axis=0)[:1].astype(jnp.float32)

    chained(name, f, jnp.zeros((1, width), jnp.float32), (tbl, idx))


which = sys.argv[1:] or ["a"]

if "a" in which:
    gtest("[512K,128] bf16 rand", 1 << 19, 128, jnp.bfloat16)
    gtest("[512K, 16] bf16 rand", 1 << 19, 16, jnp.bfloat16)
    gtest("[6M,   16] bf16 rand", 6 << 20, 16, jnp.bfloat16)
if "b" in which:
    gtest("[6M,   16] f32  rand", 6 << 20, 16, jnp.float32)
    gtest("[6M,  128] bf16 rand", 6 << 20, 128, jnp.bfloat16)
    gtest("[6M,   16] bf16 sort", 6 << 20, 16, jnp.bfloat16, sort=True)
if "c" in which:
    gtest("[64K,  16] bf16 rand", 1 << 16, 16, jnp.bfloat16)
    gtest("[64K, 128] bf16 rand", 1 << 16, 128, jnp.bfloat16)
    gtest("[512K,32] bf16 rand", 1 << 19, 32, jnp.bfloat16)
    gtest("[512K,64] bf16 rand", 1 << 19, 64, jnp.bfloat16)

if "d" in which:
    gtest("[128K,16] bf16 rand", 1 << 17, 16, jnp.bfloat16)
    gtest("[256K,16] bf16 rand", 1 << 18, 16, jnp.bfloat16)
    # windowed: random over the full 512K table but restricted to a 64K span
    tbl = (jax.random.normal(key, (1 << 19, 16), jnp.float32) * 0.1).astype(jnp.bfloat16)
    idx = jax.random.randint(key, (N,), 0, 1 << 16, jnp.int32)
    def f(c, tbl, idx):
        i = (idx + c[0, 0].astype(jnp.int32)) % (1 << 16)
        return jnp.take(tbl, i, axis=0)[:1].astype(jnp.float32)
    chained("[512K,16] 64K-window", f, jnp.zeros((1, 16), jnp.float32), (tbl, idx))

if "e" in which:
    # the real per-level forward pattern: 16 gathers of N=262144 rows each
    # from per-level tables (5 dense + 11 x 512K), summed.
    import numpy as np
    NS = 1 << 18
    sizes = [4096, 12168, 29792, 79512, 205384] + [1 << 19] * 11
    tbls = [(jax.random.normal(jax.random.PRNGKey(i), (s, 16), jnp.float32)
             * 0.1).astype(jnp.bfloat16) for i, s in enumerate(sizes)]
    idxs = [jax.random.randint(jax.random.PRNGKey(i), (NS,), 0, s, jnp.int32)
            for i, s in enumerate(sizes)]
    def f(c, *a):
        tbls, idxs = a[:16], a[16:]
        acc = 0.0
        for l in range(16):
            i = (idxs[l] + c[0, 0].astype(jnp.int32)) % tbls[l].shape[0]
            acc = acc + jnp.take(tbls[l], i, axis=0).astype(jnp.float32)
        return acc[:1]
    chained("per-level 16x gather [262K,16]", f, jnp.zeros((1, 16), jnp.float32),
            tuple(tbls) + tuple(idxs), items=NS * 16)
