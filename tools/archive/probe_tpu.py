"""One-shot TPU capability probe: device calibration + which gather
formulations Mosaic/XLA support and how fast they run.

Run sparingly — each process claims the (single) TPU.
"""

import sys
import os
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, fn, *args, n=3):
    try:
        o = fn(*args)
        float(jnp.sum(o.astype(jnp.float32)))
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            o = fn(*args)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)*1e3:.2f} ms")
        return min(ts)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
        return None


key = jax.random.PRNGKey(0)

# ---- 1. calibration
sz = 4096
a = jax.random.normal(key, (sz, sz), jnp.bfloat16)
b = jax.random.normal(key, (sz, sz), jnp.bfloat16)
t = timeit("matmul 4096 bf16", jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)), a, b)
if t:
    print(f"  -> {2*sz**3/t/1e12:.1f} TFLOP/s")
x = jax.random.normal(key, (256, 1024, 256), jnp.float32)
t = timeit("scale 256MB", jax.jit(lambda x: x * 1.000001), x)
if t:
    print(f"  -> {2*x.size*4/t/1e9:.0f} GB/s")

# ---- 2. XLA gather variants
N = 262144
M = 1 << 19
tbl = jax.random.normal(key, (M,), jnp.float32)
idx = jax.random.randint(key, (N, 128), 0, M)
timeit("xla take [N,128] of [512k]", jax.jit(lambda t_, i: jnp.take(t_, i)), tbl, idx)
idx_sorted = jnp.sort(idx, axis=0)
timeit("xla take col-sorted idx", jax.jit(lambda t_, i: jnp.take(t_, i)), tbl, idx_sorted)
tbl2d = tbl.reshape(-1, 128)
ridx = jax.random.randint(key, (N,), 0, tbl2d.shape[0])
timeit("xla row-gather [N]x128", jax.jit(lambda t_, i: jnp.take(t_, i, axis=0)), tbl2d, ridx)

# ---- 3. Pallas in-kernel gather formulations
B = 32768
pos_idx = jax.random.randint(key, (8, B), 0, M).astype(jnp.int32)
tblp = tbl.reshape(-1, 128)  # [4096, 128]


def probe_kernel(desc, kernel, out_shape, in_specs, args):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        f = jax.jit(f)
        o = f(*args)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = f(*args)
            _ = float(jnp.sum(o.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        print(f"pallas {desc}: {min(ts)*1e3:.2f} ms")
    except Exception as e:
        msg = str(e).split("\n")[0][:240]
        print(f"pallas {desc}: FAILED {type(e).__name__}: {msg}")


# 3a. flat 1-D take from a [4096,128] table reshaped in-kernel
def k_flat(idx_ref, tbl_ref, out_ref):
    t = tbl_ref[...].reshape(-1)
    out_ref[...] = jnp.take(t, idx_ref[...], axis=0)


probe_kernel(
    "take flat [8,B] of 512k",
    k_flat,
    jax.ShapeDtypeStruct((8, B), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    (pos_idx, tblp),
)


# 3b. row gather: idx rows from [4096, 128]
rowi = jax.random.randint(key, (8, B), 0, 4096).astype(jnp.int32)


def k_rows(idx_ref, tbl_ref, out_ref):
    rows = jnp.take(tbl_ref[...], idx_ref[0, :], axis=0)  # [B, 128]
    out_ref[...] = jnp.sum(rows, axis=1)[None, :] * jnp.ones((8, 1), jnp.float32)


probe_kernel(
    "take rows [B] of [4096,128]",
    k_rows,
    jax.ShapeDtypeStruct((8, B), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    (rowi, tblp),
)


# 3c. take_along_axis within lanes: [B,128] values, idx in [0,128)
vals = jax.random.normal(key, (B, 128))
li = jax.random.randint(key, (B, 128), 0, 128).astype(jnp.int32)


def k_lane(v_ref, i_ref, out_ref):
    out_ref[...] = jnp.take_along_axis(v_ref[...], i_ref[...], axis=-1)


probe_kernel(
    "take_along_axis lanes [B,128]",
    k_lane,
    jax.ShapeDtypeStruct((B, 128), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    (vals, li),
)


# 3d. one-hot matmul gather of 128-entry table (MXU)
small = jax.random.normal(key, (128, 128))


def k_onehot(i_ref, t_ref, out_ref):
    oh = jax.nn.one_hot(i_ref[...], 128, dtype=jnp.float32)  # [8, B, 128]?
    out_ref[...] = jnp.einsum("bk,kj->bj", oh[0], t_ref[...])


probe_kernel(
    "one-hot matmul 128-table",
    k_onehot,
    jax.ShapeDtypeStruct((B, 128), jnp.float32),
    [pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
    (rowi[:1].reshape(1, B), small),
)

print("probe complete; backend:", jax.default_backend())
