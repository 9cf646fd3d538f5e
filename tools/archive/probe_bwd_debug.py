"""Isolate the bwd-kernel worker crash: direct _grad_table_pallas calls at
several specs/sizes, no scan, no grad."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp

from jnerf_tpu.ops.hash_grid import HashGridSpec
from jnerf_tpu.ops import hash_nbr as H

key = jax.random.PRNGKey(0)

cases = sys.argv[1:] or ["cap18-small", "cap18-full", "nocap-small"]

for case in cases:
    if case == "cap18-small":
        spec = HashGridSpec(n_levels=16, log2_hashmap_size=19,
                            max_level_size=1 << 18)
        N = 1 << 15
    elif case == "cap18-full":
        spec = HashGridSpec(n_levels=16, log2_hashmap_size=19,
                            max_level_size=1 << 18)
        N = 1 << 18
    elif case == "nocap-small":
        spec = HashGridSpec(n_levels=16, log2_hashmap_size=19)
        N = 1 << 15
    else:
        raise SystemExit(f"unknown case {case}")

    pos = jax.random.uniform(key, (N, 3), jnp.float32)
    g = jax.random.normal(key, (N, 2 * spec.n_levels), jnp.float32) * 0.01
    t0 = time.perf_counter()
    try:
        out = jax.jit(
            lambda p, gg: H._grad_table_pallas(spec, p, gg, interpret=False)
        )(pos, g)
        out = jax.block_until_ready(out)
        print(f"{case}: OK sum={float(out.sum()):.4f} "
              f"({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:
        print(f"{case}: FAILED {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
