"""Step-level A/B: full train-step device time under one toggled variant.

Usage: python tools/probe_ab.py <encoder> <variant>
  encoder: f4l8 | f2l16
  variant: base | pallasmlp | nocombine | proberef | sweepparts
    base      — shipped defaults (XLA-chain MLP, plain RMW scatter, sweep)
    pallasmlp — the Pallas fused-MLP kernel (measured +21 ms in-step)
    nocombine — plain per-sample RMW scatter loop (now the default)
    proberef  — reference-style probe+splat grid refresh (refresh timing)
    sweepparts— decompose the sweep refresh

Prints one line: variant, per-step ms (scan4-chained, device-true).
Run each variant in a SEPARATE process (fresh jit cache, one compile each).
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

enc_name = sys.argv[1] if len(sys.argv) > 1 else "f4l8"
variant = sys.argv[2] if len(sys.argv) > 2 else "base"

from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

enc = {"f4l8": dict(hash_levels=8, hash_features=4),
       "f8l4": dict(hash_levels=4, hash_features=8),
       "f2l16": {}}[enc_name]
cfg = ngp_synthetic_cfg(
    n_images=16, H=256, W=256, tot_train_steps=10 ** 9, **enc,
)
if variant == "pallasmlp":
    cfg.use_pallas_mlp = True
if variant == "nocombine":
    from jnerf_tpu.ops import hash_nbr
    hash_nbr.RUN_COMBINE = False
if variant == "proberef":
    cfg.grid_update_mode = "probe"

from jnerf_tpu.runner import Runner

runner = Runner()
R, S = 4096, 64
runner.sampler.n_rays_per_batch = R
runner.sampler.n_samples_per_ray = S
key = jax.random.PRNGKey(0)
runner._update_grid(300, key)

def _timeit(name, f, *a, reps=4):
    out = f(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t = (time.perf_counter() - t0) / reps
    print(f"AB {enc_name} {variant} {name}: {t * 1e3:.2f} ms", flush=True)


if variant == "proberef":
    # time the refresh program itself (the thing this variant changes)
    n_u, n_n = runner.sampler.grid_update_counts(300)
    f = jax.jit(lambda p, s, k: runner.sampler.update_density_grid_fn(
        p, s, k, n_u, n_n, False))
    _timeit("refresh", f, runner.params, runner.sampler.state, key)
    sys.exit(0)

if variant == "sweepparts":
    # decompose the sweep refresh: density eval | full refresh | bitfield
    g = runner.sampler.grid_config
    n = (g.n_cells // 2) * (g.max_cascade + 1)
    warped = jax.random.uniform(key, (n, 3))
    _timeit("chunked_density(1.05M)",
            jax.jit(lambda p, w: runner.sampler._chunked_density(p, w)),
            runner.params, warped)
    f = jax.jit(lambda p, s, k: runner.sampler.update_density_grid_fn(
        p, s, k, 0, 0, False))
    _timeit("sweep refresh", f, runner.params, runner.sampler.state, key)
    from jnerf_tpu.ops.occupancy import update_bitfield, density_grid_mean
    grid = runner.sampler.state["density_grid"]
    _timeit("mean+bitfield", jax.jit(
        lambda gr: update_bitfield(gr, density_grid_mean(gr, g), g)), grid)
    sys.exit(0)

body = runner._step_fn_body(R, S)
data = runner._train_data()


@jax.jit
def chain4(p, o, e, g, data, k):
    def f(carry, kk):
        p, o, e, g = carry
        p, o, e, g, loss = body(p, o, e, g, data, kk)
        return (p, o, e, g), loss
    _, losses = jax.lax.scan(f, (p, o, e, g), jax.random.split(k, 4))
    return losses[-1]


a = (runner.params, runner.opt_state, runner.ema_state, runner.sampler.state,
     data, key)
float(jax.device_get(chain4(*a)))
t0 = time.perf_counter()
for _ in range(3):
    out = chain4(*a)
float(jax.device_get(out))
t = (time.perf_counter() - t0) / 12
print(f"AB {enc_name} {variant}: per-step {t * 1e3:.2f} ms", flush=True)
