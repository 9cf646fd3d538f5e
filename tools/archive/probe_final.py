"""Consistent scan-chained microbenches for the hash-path design decision.

Methodology (both matter on this backend):
- time REPS data-dependent iterations inside ONE jit + scalar fetch
  (per-call dispatch through the axon relay costs ~60 ms);
- pass every large array as a jit ARGUMENT — closed-over device arrays
  become HLO constants and get shipped to the remote compiler (multi-GB
  requests hang or 413).

Usage: python tools/probe_final.py 1 2 3 4 5
"""

import sys
import time
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)
N = 1 << 22          # 4.2M (sample,level) rows per step at NGP scale
TBIG = 1 << 20       # concatenated packed-row count (~6 hits/row)


def chained(name, body, carry, items, reps=4, args=()):
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
        print(f"{name}: {t*1e3:.3f} ms -> {t/items*1e9:.2f} ns/item", flush=True)
        return t
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)


def sec_xla_scatter(dtype, label):
    idx = jax.random.randint(key, (N,), 0, TBIG, jnp.int32)
    vals = jnp.ones((N, 128), dtype)

    def sc(c, idx, vals):
        i = (idx + c[0, 0].astype(jnp.int32)) % TBIG
        return jnp.zeros((TBIG, 128), dtype).at[i].add(vals)[:1].astype(jnp.float32)

    chained(f"XLA scatter {label} [4M]->[1M,128]", sc,
            jnp.zeros((1, 128), jnp.float32), N, args=(idx, vals))


def sec_pallas_scatter():
    NL, TL, BLK, unroll = 1 << 20, 1 << 14, 8192, 8

    def k_fn(idx_ref, val_ref, out_ref):
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

    def scat(idx2, vals):
        return pl.pallas_call(
            k_fn,
            grid=(NL // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TL, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((TL, 128), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(idx2, vals)

    idxl = jax.random.randint(key, (NL,), 0, TL, jnp.int32)
    vl = jnp.ones((NL, 128), jnp.float32)

    def sc_pl(c, idxl, vals):
        i = ((idxl + c[0, 0].astype(jnp.int32)) % TL).reshape(1, NL)
        return scat(i, vals)[:1]

    chained("pallas RMW scatter [1M]->[16K,128]", sc_pl,
            jnp.zeros((1, 128), jnp.float32), NL, args=(idxl, vl))


def sec_fwd(variant):
    T19 = 1 << 19
    tbl = jax.random.normal(key, (T19, 128), jnp.bfloat16)
    rows = jax.random.randint(key, (N,), 0, T19, jnp.int32)
    b = jax.random.randint(key, (N,), 0, 8, jnp.int32)
    w = jax.random.uniform(key, (N, 8), jnp.float32)

    if variant == "reshape":
        def fwd(c, tbl, rows, b, w):
            selb = jax.nn.one_hot(b, 8, dtype=jnp.float32)
            r = (rows + c[0].astype(jnp.int32)) % T19
            g = jnp.take(tbl, r, axis=0).astype(jnp.float32).reshape(N, 8, 8, 2)
            return (g * w[:, :, None, None] * selb[:, None, :, None]).sum(
                axis=(1, 2))[:, 0]

        chained("XLA fused fwd (reshape blend)", fwd,
                jnp.zeros((N,), jnp.float32), N, args=(tbl, rows, b, w))
    else:
        def fwd(c, tbl, rows, b, w):
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            r = (rows + c[0].astype(jnp.int32)) % T19
            g = jnp.take(tbl, r, axis=0)
            sel = ((lane >> 1) & 7) == b[:, None]
            wl = jnp.take_along_axis(
                w, jnp.broadcast_to(lane >> 4, (N, 128)), axis=1)
            weighted = jnp.where(sel, g.astype(jnp.float32) * wl, 0.0)
            return jnp.where((lane & 1) == 0, weighted, 0.0).sum(axis=1)

        chained("XLA fused fwd (mask blend)", fwd,
                jnp.zeros((N,), jnp.float32), N, args=(tbl, rows, b, w))


if __name__ == "__main__":
    a = sys.argv[1:]
    if "1" in a:
        sec_xla_scatter(jnp.bfloat16, "bf16")
    if "2" in a:
        sec_xla_scatter(jnp.float32, "f32")
    if "3" in a:
        sec_pallas_scatter()
    if "4" in a:
        sec_fwd("reshape")
    if "5" in a:
        sec_fwd("mask")
