"""Variants of the hash-bwd Pallas kernel at real NGP shapes, to find the
146ms -> 10ns/row gap.  Sections: novals (scatter only, constant vals),
noscat (vals only), v3d (current), v2d (2-D out ref), alt2 (2-D + two
alternating accumulators)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.lax as lax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as H

key = jax.random.PRNGKey(0)
N = 1 << 18
BLK = 8192
spec = HashGridSpec(n_levels=16, log2_hashmap_size=19, max_level_size=1 << 18)
L = spec.n_levels
NBLK = N // BLK
ROWS = max(spec.level_sizes) // 8

pos = jax.random.uniform(key, (N, 3), jnp.float32)
g = jax.random.normal(key, (N, 2 * L), jnp.float32) * 0.01

e0, _ = jax.jit(lambda p: H._entry_indices(spec, p))(pos)
rows3 = (e0 >> 3).T.astype(jnp.int32).reshape(L * NBLK, 1, BLK)
slots3 = (e0 & 7).T.astype(jnp.int32).reshape(L * NBLK, 1, BLK)
pos_t = pos.T
g_t = g.T.reshape(2, L, N).transpose(1, 0, 2)
scales = jnp.asarray(spec.scales, jnp.float32).reshape(L, 1)
rows3, slots3, pos_t, g_t = jax.block_until_ready(
    (rows3, slots3, pos_t, g_t))


def vals_phase(scale_ref, slot_ref, pos_ref, g_ref, vals_ref):
    scale = scale_ref[pl.program_id(0), 0]

    def fract(p):
        q = p * scale + 0.5
        return q - jnp.floor(q)

    fx = fract(pos_ref[0, :])[:, None]
    fy = fract(pos_ref[1, :])[:, None]
    fz = fract(pos_ref[2, :])[:, None]
    g0 = g_ref[0, 0, :][:, None]
    g1 = g_ref[0, 1, :][:, None]
    slot = slot_ref[0, 0, :][:, None]
    lane = lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    bx = ((lane >> 1) & 1).astype(jnp.float32)
    by = ((lane >> 2) & 1).astype(jnp.float32)
    bz = ((lane >> 3) & 1).astype(jnp.float32)
    bf = (lane & 1).astype(jnp.float32)
    X = (1.0 - fx) + bx * (2.0 * fx - 1.0)
    Y = (1.0 - fy) + by * (2.0 * fy - 1.0)
    Z = (1.0 - fz) + bz * (2.0 * fz - 1.0)
    G = g0 + bf * (g1 - g0)
    S = ((lane >> 4) == slot).astype(jnp.float32)
    vals_ref[:] = X * Y * Z * G * S


def make(variant):
    unroll = 8

    if variant in ("v2d", "alt2", "novals", "noscat"):
        n_acc = 2 if variant == "alt2" else 1

        def kern(scale_ref, rows_ref, slot_ref, pos_ref, g_ref, out_ref,
                 vals_ref):
            @pl.when(pl.program_id(1) == 0)
            def _():
                out_ref[:] = jnp.zeros_like(out_ref)

            if variant == "novals":
                vals_ref[:] = jnp.broadcast_to(
                    g_ref[0, 0, :][:, None] * 0.0 + 1.0, (BLK, 128))
            else:
                vals_phase(scale_ref, slot_ref, pos_ref, g_ref, vals_ref)
            if variant == "noscat":
                out_ref[0, :] += vals_ref[0, :]
                return

            def body(j, _):
                base = j * unroll
                for u in range(unroll):
                    r = rows_ref[0, 0, base + u]
                    if n_acc == 2:
                        r = r + (u % 2) * ROWS
                    out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(base + u, 1), :]
                return 0

            lax.fori_loop(0, BLK // unroll, body, 0, unroll=1)

        out_rows = ROWS * n_acc

        def run(rows3, slots3, pos_t, g_t, scales):
            acc = pl.pallas_call(
                kern,
                grid=(L, NBLK),
                in_specs=[
                    pl.BlockSpec((L, 1), lambda l, i: (0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, BLK), lambda l, i: (l * NBLK + i, 0, 0),
                                 memory_space=pltpu.SMEM),
                    pl.BlockSpec((1, 1, BLK), lambda l, i: (l * NBLK + i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((3, BLK), lambda l, i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 2, BLK), lambda l, i: (l, 0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((out_rows, 128), lambda l, i: (l, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((L * out_rows, 128),
                                               jnp.float32),
                scratch_shapes=[pltpu.VMEM((BLK, 128), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=120 * 1024 * 1024),
            )(scales, rows3, slots3, pos_t, g_t)
            return acc

        return run

    if variant == "v3d":
        def run(rows3, slots3, pos_t, g_t, scales):
            return H._grad_table_pallas.__wrapped__(
                spec, pos, g, False
            ) if False else None
        # use the library path instead
        return None


def timeit(name, fn, reps=6):
    out = fn(rows3, slots3, pos_t, g_t, scales)
    _ = float(jnp.sum(out[:1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(rows3, slots3, pos_t, g_t, scales)
    _ = float(jnp.sum(out[:1].astype(jnp.float32)))
    t = (time.perf_counter() - t0) / reps
    print(f"{name}: {t*1e3:.1f} ms ({t / (N * L) * 1e9:.2f} ns/row)",
          flush=True)


which = sys.argv[1:] or ["noscat", "novals", "v2d", "alt2"]
for v in which:
    if v == "v3d":
        f = jax.jit(lambda p, gg: H._grad_table_pallas(spec, p, gg, False))
        out = f(pos, g)
        _ = float(jnp.sum(out[:1]))
        t0 = time.perf_counter()
        for _ in range(6):
            out = f(pos, g)
        _ = float(jnp.sum(out[:1]))
        print(f"v3d (library): {(time.perf_counter()-t0)/6*1e3:.1f} ms",
              flush=True)
        continue
    timeit(v, jax.jit(make(v)))
