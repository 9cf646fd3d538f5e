"""Probe 3: row-gather/scatter rates at hash-encode scale + fusion checks."""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

key = jax.random.PRNGKey(0)
REPS = 8


def chained(name, body, x, per_call, unit):
    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), None
        out, _ = jax.lax.scan(f, x, None, length=REPS)
        return out

    try:
        o = run(x)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            o = run(x)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / REPS
        print(f"{name}: {t*1e3:.2f} ms/call -> {per_call/t/1e6:.1f} M{unit}/s")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}")


T = 1 << 19  # rows in packed table
N = 262144 * 16  # (sample, level) row fetches at full scale

tbl = jax.random.normal(key, (T, 128), jnp.float32)
tblb = tbl.astype(jnp.bfloat16)
ridx = jax.random.randint(key, (N,), 0, T)

state = jnp.zeros((8, 128), jnp.float32)


def rg_f32(c):
    rows = jnp.take(tbl, (ridx + c[0, 0].astype(jnp.int32)) % T, axis=0)
    return rows[: 8]


chained("row-gather 4.2M x128 f32", rg_f32, state, N, "rows")


def rg_bf16(c):
    rows = jnp.take(tblb, (ridx + c[0, 0].astype(jnp.int32)) % T, axis=0)
    return rows[:8].astype(jnp.float32)


chained("row-gather 4.2M x128 bf16", rg_bf16, state, N, "rows")


# gather + lane-reduce fused: weights applied, 8-block lane selection via
# broadcasted compare, reduce to [N, 16]
lane_sel = jax.random.randint(key, (N, 1), 0, 8)
w = jax.random.normal(key, (N, 16), jnp.float32)
lane_ids = (jnp.arange(128)[None, :] // 16)


def rg_reduce(c):
    rows = jnp.take(tbl, (ridx + c[0, 0].astype(jnp.int32)) % T, axis=0)  # [N,128]
    mask = (lane_ids == lane_sel).astype(jnp.float32)  # [N, 128]
    sel = (rows * mask).reshape(N, 8, 16).sum(axis=1)  # [N, 16]
    return (sel * w)[:8, :]


chained("row-gather+lane-reduce 4.2M", rg_reduce, state, N, "rows")

# row scatter-add
vals = jax.random.normal(key, (N, 128), jnp.float32)
acc0 = jnp.zeros((T, 128), jnp.float32)


def sc(c):
    return c.at[(ridx + 1) % T].add(vals)


chained("row-scatter-add 4.2M x128", sc, acc0, N, "rows")

# smaller row scatter [N,16]
vals16 = jax.random.normal(key, (N, 16), jnp.float32)
acc16 = jnp.zeros((T * 8, 16), jnp.float32)


def sc16(c):
    return c.at[(ridx * 8 + 3) % (T * 8)].add(vals16)


chained("row-scatter-add 4.2M x16", sc16, acc16, N, "rows")

# roll cost (neighborhood build): 16 rolls of an 11.9M x2 table
master = jax.random.normal(key, (11_904_000, 2), jnp.float32)


def rolls(c):
    outs = [jnp.roll(master * c[0, 0], k + 1, axis=0) for k in range(8)]
    return sum(o.sum() for o in outs) * jnp.ones((8, 128))


chained("8 rolls of 12Mx2 table", rolls, state, 8 * master.size * 4 * 2, "B")

# bool gather at march scale, 1.2M probes
bf = jax.random.uniform(key, (2_097_152,)) < 0.08
pidx = jax.random.randint(key, (1_200_000,), 0, 2_097_152)


def bg(c):
    return jnp.take(bf, (pidx + c[0, 0].astype(jnp.int32)) % 2_097_152).astype(jnp.float32)[:8, None] * jnp.ones((8, 128))


chained("bool gather 1.2M", bg, state, 1_200_000, "elem")

# searchsorted selection at march scale
cum = jnp.sort(jax.random.randint(key, (4096, 2368), 0, 200), axis=1)
tgt = jnp.arange(1, 65)


def ss(c):
    rows = (cum + c[0, 0].astype(jnp.int32) % 2)
    idx = jax.vmap(lambda r: jnp.searchsorted(r, tgt))(rows)
    return idx.astype(jnp.float32)[:8, :128]


chained("vmapped searchsorted 4096x64", ss, state, 4096 * 64, "q")

print("done")
