"""Round-2 hardware probe: what random-access primitive can beat XLA's
~0.1G accesses/s on this chip?  Measures streaming BW, XLA gather/scatter
variants, and the Pallas gather forms that lower under Mosaic (jax 0.9).

Timing: the axon relay does not honor block_until_ready, so every
measurement chains REPS data-dependent applications inside one jit (scan)
and fetches a scalar (same methodology as tools/probe_tpu2.py).

Run: python tools/probe_round2.py --section {stream,xla,pallas_rate}
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

key = jax.random.PRNGKey(0)
REPS = 16


def chained(name, body, x, items, unit="elem", reps=REPS):
    """Time `reps` data-dependent applications of body inside one jit."""

    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), None
        out, _ = jax.lax.scan(f, x, None, length=reps)
        return jnp.sum(out[0].astype(jnp.float32)) if isinstance(out, tuple) \
            else jnp.sum(out.astype(jnp.float32))

    try:
        _ = float(run(x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(run(x))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / reps
        print(f"{name}: {t*1e3:.3f} ms/call -> {items/t/1e9:.3f} G{unit}/s")
        return t
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e).splitlines()[0][:160]}")
        return None


def section_stream():
    print("== streaming / compute ==")
    x = jax.random.normal(key, (4096, 8192), jnp.float32)  # 128MB
    chained("scale 128MB r+w", lambda c: c * 1.000001, x, 2 * x.nbytes, unit="B")
    a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    chained("matmul 4096 bf16", lambda c: jnp.dot(c, a, preferred_element_type=jnp.bfloat16),
            a, 2 * 4096 ** 3, unit="FLOP")


def section_xla():
    print("== XLA gather/scatter at hash-step scale ==")
    N = 1 << 22  # 4.2M accesses/step (NGP scale)
    T = 1 << 16
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)
    idx_sorted = jnp.sort(idx)

    for W in (128, 16):
        tbl = jax.random.normal(key, (T, W), jnp.bfloat16)

        def g(c, tbl=tbl, W=W):
            i = (idx + c[0].astype(jnp.int32)) % T
            return jnp.take(tbl, i, axis=0).astype(jnp.float32).sum(axis=1)

        chained(f"row gather [{T},{W}] bf16", g, jnp.zeros((N,), jnp.float32),
                N, unit="rows", reps=4)

    tbl = jax.random.normal(key, (T, 128), jnp.bfloat16)

    def gsorted(c):
        i = jnp.minimum(idx_sorted + c[0].astype(jnp.int32), T - 1)
        return jax.lax.gather(
            tbl, i[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,)),
            (1, 128), indices_are_sorted=True, mode="clip",
        ).astype(jnp.float32).sum(axis=1)

    chained("row gather sorted-flag", gsorted, jnp.zeros((N,), jnp.float32),
            N, unit="rows", reps=4)

    vals = jnp.ones((N, 128), jnp.bfloat16)

    def sc(c):
        i = (idx + c[0, 0].astype(jnp.int32)) % T
        return jnp.zeros((T, 128), jnp.bfloat16).at[i].add(vals).astype(jnp.float32)

    chained("row scatter-add", sc, jnp.zeros((T, 128), jnp.float32), N,
            unit="rows", reps=4)

    def seg(c):
        i = (idx + c[0, 0].astype(jnp.int32)) % T
        order = jnp.argsort(i)
        v = jnp.take(vals, order, axis=0)
        return jax.ops.segment_sum(v, jnp.take(i, order), num_segments=T,
                                   indices_are_sorted=True).astype(jnp.float32)

    chained("argsort+gather+segsum scatter", seg, jnp.zeros((T, 128), jnp.float32),
            N, unit="rows", reps=4)

    def srt(c):
        i = (idx + c[0].astype(jnp.int32)) % T
        return jnp.argsort(i).astype(jnp.float32)

    chained("argsort 4M int32 alone", srt, jnp.zeros((N,), jnp.float32), N,
            unit="elem", reps=4)


def section_pallas_rate():
    print("== pallas rates ==")
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # (1) scalar dynamic-slice row-gather loop, table resident in VMEM.
    T = 4096           # [4096,128] f32 = 2MB
    N = 1 << 20
    BLK = 2048
    tbl = jax.random.normal(key, (T, 128), jnp.float32)
    idx = jax.random.randint(key, (N,), 0, T, jnp.int32)

    def k_loop(tbl_ref, idx_ref, out_ref):
        def body(i, _):
            r = idx_ref[0, i]
            out_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(r, 1), :]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0, unroll=1)

    def gather_loop(idx):
        return pl.pallas_call(
            k_loop,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(tbl, idx)

    def body(c):
        i = ((idx + c[0].astype(jnp.int32)) % T).reshape(1, N)
        return gather_loop(i).sum(axis=1)

    # correctness spot check
    try:
        out = gather_loop(idx.reshape(1, N))
        ref = jnp.take(tbl, idx[:BLK], axis=0)
        print("ds-loop gather correct:", bool(jnp.allclose(out[:BLK], ref)))
    except Exception as e:
        print("ds-loop gather FAILED:", str(e).splitlines()[0][:160])
        return
    chained("pallas ds-loop row gather (VMEM tbl)", body,
            jnp.zeros((N,), jnp.float32), N, unit="rows", reps=4)

    # (2) same but gather+weighted-reduce in kernel (fused blend, no HBM
    # round trip for the gathered rows).
    def k_fused(tbl_ref, idx_ref, w_ref, out_ref):
        def body(i, _):
            r = idx_ref[0, i]
            out_ref[pl.ds(i, 1), :] = tbl_ref[pl.ds(r, 1), :] * w_ref[pl.ds(i, 1), :]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0, unroll=1)

    w = jax.random.normal(key, (N, 128), jnp.float32)

    def fused(idx):
        return pl.pallas_call(
            k_fused,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((T, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 128), jnp.float32),
        )(tbl, idx, w)

    def body2(c):
        i = ((idx + c[0].astype(jnp.int32)) % T).reshape(1, N)
        return fused(i).sum(axis=1)

    chained("pallas ds-loop gather*w", body2, jnp.zeros((N,), jnp.float32),
            N, unit="rows", reps=4)

    # (3) scatter-add loop rate into VMEM accumulator.
    def k_scat(idx_ref, val_ref, out_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            r = idx_ref[0, i]
            out_ref[pl.ds(r, 1), :] += val_ref[pl.ds(i, 1), :]
            return 0
        jax.lax.fori_loop(0, BLK, body, 0, unroll=1)

    vals = jax.random.normal(key, (N, 128), jnp.float32)

    def scat(idx):
        return pl.pallas_call(
            k_scat,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((1, BLK), lambda i: (0, i), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, 128), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, 128), jnp.float32),
        )(idx, vals)

    def body3(c):
        i = ((idx + c[0, 0].astype(jnp.int32)) % T).reshape(1, N)
        return scat(i)

    chained("pallas ds-loop row scatter-add", body3,
            jnp.zeros((T, 128), jnp.float32), N, unit="rows", reps=4)

    # (4) lane dynamic-gather rate: out[i,j] = t[i, idx[i,j]] on [512,128].
    M = 1 << 20

    def k_lane(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    t4 = jax.random.normal(key, (M // 128, 128), jnp.float32)

    def lane(i4):
        return pl.pallas_call(
            k_lane,
            grid=(M // 128 // 512,),
            in_specs=[
                pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((512, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((512, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((M // 128, 128), jnp.float32),
        )(t4, i4)

    i4 = jax.random.randint(key, (M // 128, 128), 0, 128, jnp.int32)

    def body4(c):
        return lane((i4 + c.astype(jnp.int32)[:, :1] % 2).astype(jnp.int32) % 128).sum(axis=1)

    chained("pallas lane dyn-gather (128-wide)", body4,
            jnp.zeros((M // 128,), jnp.float32), M, unit="elem", reps=8)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", type=str, default="all")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    secs = {
        "stream": section_stream,
        "xla": section_xla,
        "pallas_rate": section_pallas_rate,
    }
    for name, f in secs.items():
        if args.section in ("all", name):
            try:
                f()
            except Exception as e:
                print(f"[{name}] crashed: {type(e).__name__}: {e}")
