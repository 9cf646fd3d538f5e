"""One-off TPU check of the sharded big-table backward (VERDICT r4 #5).

Compares the Pallas sharded backward against the exact XLA adjoint at the
reference-capacity geometry (f8l4 / f4l8 @ 2^19-entry levels), and times
fwd+bwd. Prints one JSON line per geometry.
"""

import json
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as nbr


def run(levels, feats, n=1 << 16, cap=1 << 19):
    spec = HashGridSpec(n_levels=levels, n_features_per_level=feats,
                        base_resolution=16, log2_hashmap_size=19,
                        max_level_size=cap)
    plan = nbr.bwd_accumulator_plan(spec)
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (spec.n_entries, feats), jnp.float32) * 0.1
    p = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (n, feats * levels),
                          jnp.float32)

    gp = jax.jit(lambda p, g: nbr._grad_table_pallas(spec, p, g, False))
    gx = jax.jit(lambda p, g: nbr._grad_table_xla(spec, p, g))
    a = jax.device_get(gp(p, g))
    b = jax.device_get(gx(p, g))
    err = float(np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9))

    def timeit(fn, *a_, reps=10):
        fn(*a_)
        jax.block_until_ready(fn(*a_))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*a_)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps * 1e3

    # full fwd+bwd, fwd alone, pallas bwd, unpack alone
    def loss(t):
        return jnp.sum(nbr.hash_encode_nbr(spec, t, p) ** 2)

    ms = timeit(jax.jit(jax.grad(loss)), t)
    ms_fwd = timeit(jax.jit(lambda t: jnp.sum(
        nbr.hash_encode_nbr(spec, t, p))), t)
    ms_bwd = timeit(gp, p, g)
    F = feats
    P = 128 // (8 * F)
    slabs = tuple(
        jnp.ones((sz // P, 128), jnp.float32) for sz in spec.level_sizes)
    ms_unpack = timeit(jax.jit(
        lambda s: nbr.unpack_slabs(spec, list(s))), slabs)
    print(json.dumps({
        "geom": f"f{feats}l{levels}", "cap": cap, "n": n,
        "rel_err": round(err, 5),
        "n_shards": plan.get("shard", {}).get("n_shards", 1),
        "k": plan["k"], "k2": plan["k2"], "L": levels,
        "fwd_bwd_ms": round(ms, 2), "fwd_ms": round(ms_fwd, 2),
        "bwd_ms": round(ms_bwd, 2), "unpack_ms": round(ms_unpack, 2),
    }), flush=True)


if __name__ == "__main__":
    for lv, ft in [(4, 8), (8, 4)]:
        run(lv, ft)
