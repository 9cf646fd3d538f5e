"""Scatter-add shootout at realistic hash-bwd shapes.

Real workload: 4.2M row-grads into ~760K rows (one concatenated scatter,
~6 hits/row) or 262K rows into 65K rows per level.  Width 16 (one entry
neighborhood) vs 128 (8-entry packed rows)."""

import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)


def bench(name, fn, *args, items, reps=4):
    runner = jax.jit(lambda *a: fn(*a))
    try:
        out = runner(*args)
        _ = float(jnp.sum(out[0, :8].astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [runner(*args) for _ in range(reps)]
            _ = [float(jnp.sum(o[0, :8].astype(jnp.float32))) for o in outs]
            ts.append(time.perf_counter() - t0)
        t = min(ts) / reps
        print(f"{name}: {t*1e3:.2f} ms -> {items/t/1e9:.3f} Grows/s ({t/items*1e9:.2f} ns/row)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}")


N = 1 << 22
T = 1 << 20  # ~real concatenated packed-row count (6M entries/8)
idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

for W in (16, 128):
    for dt in (jnp.float32, jnp.bfloat16):
        vals = jnp.ones((N, W), dt)
        bench(f"XLA scatter [{N>>20}M]->[{T>>10}K,{W}] {dt.__name__}",
              lambda i, v, W=W, dt=dt: jnp.zeros((T, W), dt).at[i].add(v),
              idx, vals, items=N)

# Per-level granularity: 16 scatters of 262144 into 65536.
NL, TL = 1 << 18, 1 << 16
idxl = jax.random.randint(key, (NL,), 0, TL, jnp.int32)
valsl = jnp.ones((NL, 16), jnp.float32)
bench("XLA per-level scatter x16 [256K]->[64K,16] f32",
      lambda i, v: sum(
          [jnp.zeros((TL, 16), jnp.float32).at[(i + 37 * k) % TL].add(v)[:1]
           for k in range(16)], jnp.zeros((1, 16))),
      idxl, valsl, items=NL * 16)


# Pallas RMW loop scatter into VMEM accumulator, width 128 f32.
def mk_scatter(T, BLK, unroll, W=128):
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
        n = idx.shape[1]
        return pl.pallas_call(
            k,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, W), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(idx, vals)
    return scat


# correctness at small scale
s = mk_scatter(1024, 2048, 8)
i0 = jax.random.randint(key, (1, 8192), 0, 1024, jnp.int32)
v0 = jax.random.normal(key, (8192, 128), jnp.float32)
got = s(i0, v0)
want = jnp.zeros((1024, 128), jnp.float32).at[i0[0]].add(v0)
print("pallas scatter correct:", bool(jnp.allclose(got, want, atol=1e-3)))

# rate at per-level scale: accumulator [65536,128] f32 = 32MB VMEM
NL2 = 1 << 20
idx2 = jax.random.randint(key, (1, NL2), 0, 65536, jnp.int32)
vals2 = jnp.ones((NL2, 128), jnp.float32)
for unroll in (8, 16):
    s = mk_scatter(65536, 8192, unroll)
    bench(f"pallas RMW scatter unroll={unroll} [1M]->[64K,128] f32",
          s, idx2, vals2, items=NL2)
