"""Probe 2: overhead-free timings via in-jit chaining + Mosaic 2D-gather
capability matrix."""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

key = jax.random.PRNGKey(0)
REPS = 16


def chained(name, make_body, x, per_call_items, unit="elem"):
    """Time REPS data-dependent applications of body inside one jit."""
    body = make_body

    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), None
        out, _ = jax.lax.scan(f, x, None, length=REPS)
        return out

    try:
        o = run(x)
        _ = float(jnp.sum(o[0].astype(jnp.float32)) if isinstance(o, tuple) else jnp.sum(o.astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = run(x)
            _ = float(jnp.sum(o[0].astype(jnp.float32)) if isinstance(o, tuple) else jnp.sum(o.astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        t = (min(ts)) / REPS
        rate = per_call_items / t
        print(f"{name}: {t*1e3:.3f} ms/call -> {rate/1e9:.2f} G{unit}/s")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


# 1. matmul
a = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
chained("matmul4096", lambda c: jnp.dot(c, a, preferred_element_type=jnp.bfloat16),
        a, 2 * 4096 ** 3, unit="FLOP")

# 2. copy bw
x = jax.random.normal(key, (4096, 8192), jnp.float32)  # 128MB
chained("scale128MB", lambda c: c * 1.000001, x, 2 * x.size * 4, unit="B")

# 3. XLA row gather, chained (re-derive rows from data to chain)
tbl = jax.random.normal(key, (8192, 128), jnp.float32)
ridx = jax.random.randint(key, (262144,), 0, 8192)


def rg(c):
    rows = jnp.take(tbl, (ridx + c[0, 0].astype(jnp.int32)) % 8192, axis=0)
    return rows


chained("xla row-gather 262k x 128f32", rg, tbl[:262144 // 32].repeat(32, 0)[:262144],
        262144 * 128 * 4, unit="B(rows)")

# 4. XLA element gather chained
flat = jax.random.normal(key, (1 << 19,), jnp.float32)
eidx = jax.random.randint(key, (262144, 128), 0, 1 << 19)


def eg(c):
    return jnp.take(flat, (eidx + c[:1, :1].astype(jnp.int32)) % (1 << 19))


chained("xla elem-gather 33.5M", eg, jnp.zeros((262144, 128)), 262144 * 128)

# 5. XLA take_along_axis axis=1 (lane shuffle)
vals = jax.random.normal(key, (262144, 128), jnp.float32)
li = jax.random.randint(key, (262144, 128), 0, 128)
chained("xla tala axis1 33.5M",
        lambda c: jnp.take_along_axis(c, li, axis=1), vals, 262144 * 128)

# 6. XLA take_along_axis axis=0 on [T,128]
t0v = jax.random.normal(key, (262144, 128), jnp.float32)
ri = jax.random.randint(key, (262144, 128), 0, 262144)
chained("xla tala axis0 33.5M",
        lambda c: jnp.take_along_axis(c, ri, axis=0), t0v, 262144 * 128)


# 7. Pallas probes (separate tiny pallas_calls)
def probe_pallas(desc, kernel, out_shape, args):
    try:
        f = jax.jit(pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in args],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ))
        o = f(*args)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        # chained timing: call 10x (dispatch async, read once)
        t0 = time.perf_counter()
        for _ in range(10):
            o = f(*args)
        _ = float(jnp.sum(o.astype(jnp.float32)))
        t = (time.perf_counter() - t0) / 10
        print(f"pallas {desc}: OK ~{t*1e3:.2f} ms/call (incl overhead)")
    except Exception as e:
        print(f"pallas {desc}: FAILED {type(e).__name__}: {str(e)[:160]}")


B = 8192
tblp = jax.random.normal(key, (512, 128), jnp.float32)
idx_r = jax.random.randint(key, (B, 128), 0, 512).astype(jnp.int32)


def k_tala0(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=0)


probe_pallas("tala axis0 [8k,128] from [512,128]", k_tala0,
             jax.ShapeDtypeStruct((B, 128), jnp.float32), (tblp, idx_r))

tblp2 = jax.random.normal(key, (B, 128), jnp.float32)
idx_l = jax.random.randint(key, (B, 128), 0, 128).astype(jnp.int32)


def k_tala1(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take_along_axis(t_ref[...], i_ref[...], axis=1)


probe_pallas("tala axis1 [8k,128] lanes", k_tala1,
             jax.ShapeDtypeStruct((B, 128), jnp.float32), (tblp2, idx_l))

tbl_big = jax.random.normal(key, (4096, 128), jnp.float32)
idx_rb = jax.random.randint(key, (B, 128), 0, 4096).astype(jnp.int32)
probe_pallas("tala axis0 [8k,128] from [4096,128]", k_tala0,
             jax.ShapeDtypeStruct((B, 128), jnp.float32), (tbl_big, idx_rb))


def k_rowtake(t_ref, i_ref, o_ref):
    o_ref[...] = jnp.take(t_ref[...], i_ref[:, 0], axis=0)


probe_pallas("take rows [B] from [4096,128]", k_rowtake,
             jax.ShapeDtypeStruct((B, 128), jnp.float32), (tbl_big, idx_rb))

print("done; backend:", jax.default_backend())
