"""Find what makes big-table gathers fast: scoped-VMEM compiler option vs
two-sub-table select-gather split.  N=4.2M rows, chained."""

import sys
import time
import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
N = 1 << 22


def chained(name, body, carry, args, reps=4, items=N, opts=None):
    @jax.jit
    def run(c, *a):
        def f(c, _):
            return body(c, *a), None
        out, _ = jax.lax.scan(f, c, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    if opts:
        run = jax.jit(run.__wrapped__, compiler_options=opts)
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
              f"{str(e).splitlines()[0][:200]}", flush=True)


def mk(n_rows, width=16, dtype=jnp.bfloat16, k=0):
    return (jax.random.normal(jax.random.PRNGKey(k), (n_rows, width),
                              jnp.float32) * 0.1).astype(dtype)


which = sys.argv[1:] or ["opt", "split", "knee"]

if "knee" in which:
    for n_rows, label in [(320 * 1024, "320K=10MB"), (384 * 1024, "384K=12MB"),
                          (448 * 1024, "448K=14MB")]:
        tbl = mk(n_rows)
        idx = jax.random.randint(key, (N,), 0, n_rows, jnp.int32)

        def f(c, tbl, idx):
            i = (idx + c[0, 0].astype(jnp.int32)) % tbl.shape[0]
            return jnp.take(tbl, i, axis=0)[:1].astype(jnp.float32)

        chained(f"[{label},16] bf16", f, jnp.zeros((1, 16), jnp.float32),
                (tbl, idx))

if "opt" in which:
    tbl = mk(1 << 19)
    idx = jax.random.randint(key, (N,), 0, 1 << 19, jnp.int32)

    def f(c, tbl, idx):
        i = (idx + c[0, 0].astype(jnp.int32)) % tbl.shape[0]
        return jnp.take(tbl, i, axis=0)[:1].astype(jnp.float32)

    for kib in (32768, 65536, 131072):
        chained(f"[512K,16] scoped_vmem={kib}KiB", f,
                jnp.zeros((1, 16), jnp.float32), (tbl, idx),
                opts={"xla_tpu_scoped_vmem_limit_kib": str(kib)})

if "split" in which:
    half = 1 << 18
    ta, tb = mk(half, k=1), mk(half, k=2)
    idx = jax.random.randint(key, (N,), 0, 1 << 19, jnp.int32)

    def f(c, ta, tb, idx):
        i = (idx + c[0, 0].astype(jnp.int32)) % (1 << 19)
        lo = jnp.take(ta, jnp.minimum(i, half - 1), axis=0)
        hi = jnp.take(tb, jnp.maximum(i - half, 0), axis=0)
        sel = (i < half)[:, None]
        return jnp.where(sel, lo, hi)[:1].astype(jnp.float32)

    chained("[512K,16] 2x256K select-split", f,
            jnp.zeros((1, 16), jnp.float32), (ta, tb, idx))
