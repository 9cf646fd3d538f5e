"""Round-5 decomposition of the cap19 encoder step (VERDICT r4 #3/#5).

The cap19 (reference-capacity 2^19-entry tables) path is ~3.4x slower than
cap16 end-to-end.  This probe times the forward/backward PIECES and A/Bs
the candidate fixes:

forward gather, per big level (64 MB nbr operand at f8l4):
  split8   the shipped _take_split (8 sub-gathers + 7 selects)
  direct   one jnp.take on the whole 64 MB operand
build      build_nbr_table alone (streams ~0.5 GB at cap19 f8l4)
unpack     unpack_slabs alone (the 18 ms backward tail)
variants of unpack measured separately when present.

Prints one JSON line.  TPU-only numbers are meaningful; runs anywhere.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as nbr


def timeit(fn, *a, reps=20):
    # Sync via device_get of the scalar result: on the axon relay
    # block_until_ready is a no-op (measured: every tier "ran" in 0.02 ms
    # under it), while a host transfer genuinely drains the stream — the
    # same rule every trusted probe in tools/ follows.
    fn(*a)
    float(jax.device_get(fn(*a)))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*a)
    float(jax.device_get(r))
    return (time.perf_counter() - t0) / reps * 1e3


def main(levels=4, feats=8, n=1 << 17, cap=1 << 19):
    spec = HashGridSpec(n_levels=levels, n_features_per_level=feats,
                        base_resolution=16, log2_hashmap_size=19,
                        max_level_size=cap)
    key = jax.random.PRNGKey(0)
    t = jax.random.normal(key, (spec.n_entries, feats), jnp.float32) * 0.1
    p = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (n, feats * levels),
                          jnp.float32)
    out = {"geom": f"f{feats}l{levels}", "cap": cap, "n": n,
           "backend": jax.default_backend()}

    # --- build alone
    out["build_ms"] = round(timeit(jax.jit(
        lambda t: build_tuple_sum(spec, t)), t), 2)

    # --- per-big-level gather: split vs direct
    big = max(spec.level_sizes)
    tbl = jax.random.normal(jax.random.PRNGKey(3), (big, 8 * feats),
                            nbr.GATHER_DTYPE)
    idx = jax.random.randint(jax.random.PRNGKey(4), (n,), 0, big, jnp.int32)
    out["gather_split_ms"] = round(timeit(jax.jit(
        lambda tb, ix: jnp.sum(nbr._take_split(tb, ix).astype(jnp.float32))),
        tbl, idx), 2)
    out["gather_direct_ms"] = round(timeit(jax.jit(
        lambda tb, ix: jnp.sum(jnp.take(tb, ix, axis=0).astype(jnp.float32))),
        tbl, idx), 2)

    # --- whole fwd
    out["fwd_ms"] = round(timeit(jax.jit(
        lambda t, p: jnp.sum(nbr.hash_encode_nbr(spec, t, p))), t, p), 2)

    # --- unpack alone (current) + the full pallas bwd
    P = 128 // (8 * feats)
    slabs = tuple(
        jax.random.normal(jax.random.PRNGKey(10 + i), (sz // P, 128),
                          jnp.float32)
        for i, sz in enumerate(spec.level_sizes))
    out["unpack_ms"] = round(timeit(jax.jit(
        lambda s: sum(jnp.sum(x) for x in
                      nbr.unpack_slabs(spec, list(s)))), slabs), 2)
    if jax.default_backend() != "cpu":
        out["bwd_ms"] = round(timeit(jax.jit(
            lambda p, g: jnp.sum(
                nbr._grad_table_pallas(spec, p, g, False))), p, g), 2)
    print(json.dumps(out), flush=True)


def build_tuple_sum(spec, t):
    # Full-array reductions: a [:1] slice invites XLA to DCE the rest of
    # the build, and the reduction itself is noise next to the streamed GB.
    parts = nbr.build_nbr_table(spec, t.astype(nbr.GATHER_DTYPE))
    return sum(jnp.sum(x.astype(jnp.float32)) for x in parts)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, default=4)
    ap.add_argument("--feats", type=int, default=8)
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--cap", type=int, default=1 << 19)
    a = ap.parse_args()
    main(a.levels, a.feats, a.n, a.cap)
