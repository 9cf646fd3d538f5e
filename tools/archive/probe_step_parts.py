"""Decompose the 205 ms model fwd+bwd at NGP scale: model fwd only, hash
encode fwd only, hash grad only (direct kernel), hash fwd+bwd via jax.grad,
model fwd+bwd.  Async 10-call loops (per-call dispatch amortized)."""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import jax
import jax.numpy as jnp

from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg
from jnerf_tpu.utils.config import get_cfg

cfg = ngp_synthetic_cfg(n_images=8, H=256, W=256)
from jnerf_tpu.utils.registry import DATASETS, NETWORKS, build_from_cfg
import jnerf_tpu.dataset  # register datasets

# minimal dataset hookup for encoder aabb
cfg.dataset_obj = build_from_cfg(cfg.dataset.train, DATASETS)
model = build_from_cfg(cfg.model, NETWORKS)
cfg.model_obj = model

key = jax.random.PRNGKey(0)
params = model.init(key)
N = 1 << 18
pos = jax.random.uniform(key, (N, 3), jnp.float32)
dirs = jax.random.normal(key, (N, 3), jnp.float32)
dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
spec = model.pos_encoder.spec
print(f"spec entries={spec.n_entries} sizes[5]={spec.level_sizes[5]}",
      flush=True)

from jnerf_tpu.ops import hash_nbr as H


def _sync(out):
    # the relay fakes block_until_ready; a scalar fetch forces completion
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(name, fn, *args, reps=10):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    t = (time.perf_counter() - t0) / reps
    print(f"{name}: {t*1e3:.1f} ms", flush=True)


which = sys.argv[1:] or ["efwd", "ekern", "egrad", "mfwd", "mgrad"]

grid = params["pos_encoder"]["grid"]

if "efwd" in which:
    f = jax.jit(lambda g, p: H.hash_encode_nbr(spec, g, p))
    timeit("hash encode fwd", f, grid, pos)

if "ekern" in which:
    gup = jax.random.normal(key, (N, 2 * spec.n_levels), jnp.float32) * 0.01
    f = jax.jit(lambda p, gg: H._grad_table_pallas(spec, p, gg, False))
    timeit("hash grad kernel (direct)", f, pos, gup)

if "egrad" in which:
    f = jax.jit(jax.grad(
        lambda g, p: jnp.mean(H.hash_encode_nbr(spec, g, p) ** 2)))
    timeit("hash fwd+bwd (jax.grad)", f, grid, pos)

if "mfwd" in which:
    f = jax.jit(lambda pr, a, b: model(pr, a, b))
    timeit("model fwd", f, params, pos, dirs)

if "mgrad" in which:
    f = jax.jit(jax.grad(
        lambda pr, a, b: jnp.mean(model(pr, a, b) ** 2)))
    timeit("model fwd+bwd", f, params, pos, dirs)
