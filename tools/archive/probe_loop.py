"""Microbench: Pallas scalar-loop gather/scatter rates with manual 8-way
unrolling (Mosaic fori_loop only supports unroll=1|full)."""

import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)


def chained(name, body, x, items, reps=4):
    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), None
        out, _ = jax.lax.scan(f, x, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))

    try:
        _ = float(run(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(x))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / reps
        print(f"{name}: {t*1e3:.3f} ms -> {items/t/1e9:.3f} Grows/s ({t/items*1e9:.2f} ns/row)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:200]}")


T = 65536  # full hashed-level packed slice, bf16 [T,128] = 16MB
N = 1 << 20
BLK = 8192
tbl = jax.random.normal(key, (T, 128), jnp.float32)
idx0 = jax.random.randint(key, (N,), 0, T, jnp.int32)


def mk_gather(unroll):
    def k(tbl_ref, idx_ref, out_ref):
        def body(j, _):
            base = j * unroll
            for u in range(unroll):
                r = idx_ref[0, base + u]
                out_ref[pl.ds(base + u, 1), :] = tbl_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BLK // unroll, body, 0, unroll=1)

    def gather(idx):
        return pl.pallas_call(
            k,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(tbl, idx)
    return gather


# correctness
g8 = mk_gather(8)
out = g8(idx0.reshape(1, N))
ref = jnp.take(tbl, idx0[:BLK], axis=0)
print("unroll8 gather correct:", bool(jnp.allclose(out[:BLK].astype(jnp.float32),
                                                   ref.astype(jnp.float32))))

for unroll in (1, 4, 8, 16):
    g = mk_gather(unroll)

    def body(c, g=g):
        i = ((idx0 + c[0, 0].astype(jnp.int32)) % T).reshape(1, N)
        return g(i)[:, :1]  # tiny output read to keep the chain cheap

    chained(f"gather unroll={unroll}", body, jnp.zeros((N, 1), jnp.float32), N)


# scatter RMW into VMEM accumulator; 8-unrolled sequential adds
def mk_scatter(unroll):
    def k(idx_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            base = j * unroll
            for u in range(unroll):
                r = idx_ref[0, base + u]
                out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(base + u, 1), :]
            return 0
        jax.lax.fori_loop(0, BLK // unroll, body, 0, unroll=1)

    def scat(idx, vals):
        return pl.pallas_call(
            k,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
        )(idx, vals)
    return scat


vals = jax.random.normal(key, (N, 128), jnp.float32)
s8 = mk_scatter(8)
got = s8(idx0.reshape(1, N), vals)
want = jnp.zeros((T, 128), jnp.float32).at[idx0].add(vals)
print("unroll8 scatter correct:", bool(jnp.allclose(got, want, atol=1e-3)))

for unroll in (1, 8):
    s = mk_scatter(unroll)

    def body(c, s=s):
        i = ((idx0 + c[0, 0].astype(jnp.int32)) % T).reshape(1, N)
        return s(i, vals)[:1, :]

    chained(f"scatter unroll={unroll}", body, jnp.zeros((1, 128), jnp.float32), N)
