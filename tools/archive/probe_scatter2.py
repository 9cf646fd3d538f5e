"""Hazard-interleaved Pallas scatter + fused XLA forward microbenches."""

import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)


def bench(name, fn, *args, items, reps=4):
    runner = jax.jit(fn)
    try:
        out = runner(*args)
        _ = float(jnp.sum(jnp.ravel(out)[:8].astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [runner(*args) for _ in range(reps)]
            _ = [float(jnp.sum(jnp.ravel(o)[:8].astype(jnp.float32))) for o in outs]
            ts.append(time.perf_counter() - t0)
        t = min(ts) / reps
        print(f"{name}: {t*1e3:.2f} ms -> {t/items*1e9:.2f} ns/item")
        return t
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}")


# ---- interleaved-accumulator scatter: K independent [T,128] f32 buffers ----
def mk_scatter_k(T, BLK, K, unroll=8):
    def k_fn(idx_ref, val_ref, out_ref, acc):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        def body(j, _):
            base = j * unroll
            for u in range(unroll):
                r = idx_ref[0, base + u]
                s = (base + u) % K
                acc[s, pl.ds(r, 1), :] += val_ref[pl.ds(base + u, 1), :]
            return 0
        jax.lax.fori_loop(0, BLK // unroll, body, 0, unroll=1)

        @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
        def _():
            tot = acc[0]
            for s in range(1, K):
                tot = tot + acc[s]
            out_ref[:] = tot

    def scat(idx, vals):
        n = idx.shape[1]
        return pl.pallas_call(
            k_fn,
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((K, T, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(idx, vals)
    return scat


# correctness
s = mk_scatter_k(1024, 2048, 2)
i0 = jax.random.randint(key, (1, 8192), 0, 1024, jnp.int32)
v0 = jax.random.normal(key, (8192, 128), jnp.float32)
want = jnp.zeros((1024, 128), jnp.float32).at[i0[0]].add(v0)
print("interleaved scatter correct:",
      bool(jnp.allclose(s(i0, v0), want, atol=1e-3)))

NL2 = 1 << 20
idx2 = jax.random.randint(key, (1, NL2), 0, 16384, jnp.int32)
vals2 = jnp.ones((NL2, 128), jnp.float32)
for K in (2, 4):
    s = mk_scatter_k(16384, 8192, K)
    bench(f"pallas K={K} interleaved scatter [1M]->[16K,128]", s, idx2, vals2,
          items=NL2)

# ---- fused XLA forward: gather + in-place blend (no materialized factor) ----
# Packed rows [T,128]; per sample: b (0..7), w (8 corner weights).
T = 1 << 19
N = 1 << 22
tbl = jax.random.normal(key, (T, 128), jnp.bfloat16)
rows = jax.random.randint(key, (N,), 0, T, jnp.int32)
b = jax.random.randint(key, (N,), 0, 8, jnp.int32)
w = jax.random.uniform(key, (N, 8), jnp.float32)

lane = jnp.arange(128, dtype=jnp.int32)
B_OF_LANE = (lane >> 1) & 7          # base slot of each lane
C_OF_LANE = lane >> 4                # corner of each lane
F_OF_LANE = lane & 1                 # feature of each lane


def fwd(tbl, rows, b, w):
    g = jnp.take(tbl, rows, axis=0)                     # [N,128] bf16
    sel = (B_OF_LANE[None, :] == b[:, None])
    wl = jnp.take_along_axis(
        w, jnp.broadcast_to(C_OF_LANE[None, :], (N, 128)), axis=1)
    weighted = jnp.where(sel, g.astype(jnp.float32) * wl, 0.0)
    f0 = jnp.where(F_OF_LANE[None, :] == 0, weighted, 0.0).sum(axis=1)
    f1 = jnp.where(F_OF_LANE[None, :] == 1, weighted, 0.0).sum(axis=1)
    return f0, f1


bench("XLA fused fwd gather+blend [4M rows]", fwd, tbl, rows, b, w, items=N)


# same but with the reduction expressed on a reshape (may fuse better)
def fwd2(tbl, rows, b, w):
    g = jnp.take(tbl, rows, axis=0).astype(jnp.float32).reshape(N, 8, 8, 2)
    wl = w[:, :, None, None]                            # corner weights
    selb = jax.nn.one_hot(b, 8, dtype=jnp.float32)[:, None, :, None]
    return (g * wl * selb).sum(axis=(1, 2))             # [N,2]


bench("XLA fused fwd reshape variant", fwd2, tbl, rows, b, w, items=N)

# gather alone for reference
bench("XLA gather alone [4M,128] bf16",
      lambda tbl, rows: jnp.take(tbl, rows, axis=0).astype(jnp.float32).sum(axis=1),
      tbl, rows, items=N)
