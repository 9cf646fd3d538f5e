"""Micro-probe: Pallas scalar RMW scatter-loop variants (round 3).

The hash backward's cost is the per-(sample,level) RMW into a VMEM
accumulator — measured ~10 ns/row in round 2 and ~26 ns/row for the
(abandoned) run-combined branchy loop.  Hypothesis: the loop is vector-
ISSUE-bound, so variants that cut issued ops per row should win:

  plain   — the shipped loop: dynamic vals read + dynamic out RMW per row
  slab    — ONE [U,128] vals slab read per U rows + sublane select per row
  unroll16— plain with unroll 16
  wide    — slab with unroll 16

Rows/indices mimic the real workload (ray-coherent runs, f2l16 level mix).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 21          # rows to scatter (f2l16 scale: 4.2M; halved for speed)
BLK = 8192
ROWS = 32768         # accumulator rows (2^18 entries / 8 per row)


def make_kernel(mode: str):
    unroll = 16 if mode in ("unroll16", "wide") else 8
    slab = mode in ("slab", "wide")

    def kern(rows_ref, vals_ref, out_ref):
        import jax.lax as lax

        @pl.when(pl.program_id(0) == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(j, _):
            base = j * unroll
            if slab:
                v = vals_ref[pl.ds(base, unroll), :]
                for u in range(unroll):
                    r = rows_ref[0, 0, base + u]
                    out_ref[pl.ds(r, 1), :] += v[u:u + 1, :]
            else:
                for u in range(unroll):
                    r = rows_ref[0, 0, base + u]
                    out_ref[pl.ds(r, 1), :] += vals_ref[pl.ds(base + u, 1), :]
            return 0

        lax.fori_loop(0, BLK // unroll, body, 0, unroll=1)

    return kern


def run(mode: str):
    nblk = N // BLK
    # ray-coherent rows: runs with the f2l16 level mix (run lengths 1..64)
    rng = np.random.default_rng(0)
    rows = np.empty(N, np.int32)
    i = 0
    while i < N:
        run_len = int(rng.choice([1, 1, 2, 2, 3, 4, 8, 16, 32, 64]))
        rows[i:i + run_len] = rng.integers(0, ROWS)
        i += run_len
    rows2 = jnp.asarray(rows.reshape(nblk, 1, BLK))
    vals = jax.random.normal(jax.random.PRNGKey(0), (N, 128), jnp.float32)

    f = pl.pallas_call(
        make_kernel(mode),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, 1, BLK), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLK, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    g = jax.jit(lambda r, v: f(r, v))
    out = g(rows2, vals)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = g(rows2, vals)
    float(jnp.sum(out))
    t = (time.perf_counter() - t0) / reps
    print(f"rmw {mode}: {t * 1e3:.2f} ms -> {t / N * 1e9:.2f} ns/row",
          flush=True)


for mode in sys.argv[1:] or ["plain", "slab", "unroll16", "wide"]:
    run(mode)
