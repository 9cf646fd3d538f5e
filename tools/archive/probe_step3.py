"""Round-3 step decomposition at bench scale.

Times the full jitted train step (scan-chained, dispatch-amortized) and its
tiers in isolation: ray-gen, march, SH, composite+loss, optimizer+EMA, grid
refresh, model fwd+bwd.  Run AFTER any bench process releases the chip.

Usage: python tools/probe_step3.py [f4l8|f2l16] [part ...]
"""

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp

args = sys.argv[1:]
enc_name = "f4l8" if (not args or args[0] not in ("f2l16",)) else "f2l16"
which = [a for a in args if a not in ("f4l8", "f2l16")] or [
    "step", "window", "march", "sh", "comp", "opt", "refresh", "model"]

from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg
from jnerf_tpu.runner import Runner

enc = dict(hash_levels=8, hash_features=4) if enc_name == "f4l8" else {}
cfg = ngp_synthetic_cfg(n_images=16, H=256, W=256, tot_train_steps=10 ** 9,
                        **enc)
runner = Runner()
R, S = 4096, 64
runner.sampler.n_rays_per_batch = R
runner.sampler.n_samples_per_ray = S
N = R * S
print(f"encoder={enc_name} R={R} S={S}", flush=True)

key = jax.random.PRNGKey(0)
# Settle grid state with one refresh so march/step see realistic occupancy.
runner._update_grid(300, key)


def _sync(out):
    leaves = jax.tree.leaves(out)
    return float(jnp.sum(leaves[0].astype(jnp.float32)))


def timeit(name, fn, *a, reps=10):
    _sync(fn(*a))
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*a)
    _sync(out)
    t = (time.perf_counter() - t0) / reps
    print(f"{name}: {t * 1e3:.2f} ms", flush=True)
    return t


if "step" in which:
    # chained: thread real state through the step body 4x inside one jit
    body = runner._step_fn_body(R, S)
    data = runner._train_data()

    @jax.jit
    def chain4(p, o, e, g, data, k):
        def f(carry, kk):
            p, o, e, g = carry
            p, o, e, g, loss = body(p, o, e, g, data, kk)
            return (p, o, e, g), loss
        carry, losses = jax.lax.scan(
            f, (p, o, e, g), jax.random.split(k, 4))
        return losses[-1]

    t = timeit("full step (scan4, device-true)", chain4, runner.params,
               runner.opt_state, runner.ema_state, runner.sampler.state,
               data, key, reps=4)
    print(f"  -> per-step {t / 4 * 1e3:.2f} ms", flush=True)

if "window" in which:
    t0 = time.perf_counter()
    loss = runner.train_range(304, 304 + 64)
    float(jax.device_get(loss))
    t = (time.perf_counter() - t0) / 64
    print(f"train_range 64 steps incl refresh+adapt: {t * 1e3:.2f} ms/step",
          flush=True)

if "march" in which:
    bf = runner.sampler.state["bitfield"]
    ro = jax.random.uniform(key, (R, 3)) * 0.4 + 0.3
    rd = jax.random.normal(key, (R, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    f = jax.jit(lambda bf, o, d, k: runner.sampler.sample_fixed(
        {"bitfield": bf}, o, d, k, S))
    timeit("march (sample_fixed)", f, bf, ro, rd, key)

if "sh" in which:
    from jnerf_tpu.ops.sh import sh_encode

    dirs = jax.random.normal(key, (N, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dw = dirs * 0.5 + 0.5
    f = jax.jit(lambda d: sh_encode(d, 4))
    try:
        timeit("SH encode", f, dw)
    except Exception as e:
        print("SH probe failed:", str(e).splitlines()[0])

if "comp" in which:
    from jnerf_tpu.ops.composite import render_rays

    raw = jax.random.normal(key, (R, S, 4))
    dts = jnp.full((R, S), 1e-3)
    valid = jnp.ones((R, S), bool)
    bg = jax.random.uniform(key, (R, 3))
    tgt = jax.random.uniform(key, (R, 3))

    def f(raw):
        rgb, _ = render_rays(raw, dts, valid, None, bg)
        return jnp.mean((rgb - tgt) ** 2)

    timeit("composite+mse fwd", jax.jit(f), raw)
    timeit("composite+mse fwd+bwd", jax.jit(jax.grad(f)), raw)

if "opt" in which:
    grads = jax.tree.map(lambda p: p * 1e-3, runner.params)

    @jax.jit
    def f(g, o, p, e):
        up, o = runner.tx.update(g, o, p)
        p = jax.tree.map(lambda a, b: a + b, p, up)
        p, e = runner.ema.step(p, e)
        return p, o, e

    timeit("adam+ema", f, grads, runner.opt_state, runner.params,
           runner.ema_state)

if "refresh" in which:
    n_u, n_n = runner.sampler.grid_update_counts(300)
    f = jax.jit(lambda p, s, k: runner.sampler.update_density_grid_fn(
        p, s, k, n_u, n_n, False))
    t = timeit("grid refresh", f, runner.params, runner.sampler.state, key,
               reps=4)
    print(f"  -> amortized {t / 16 * 1e3:.2f} ms/step", flush=True)

if "model" in which:
    pos = jax.random.uniform(key, (N, 3))
    dirs = jax.random.uniform(key, (N, 3))

    def loss(p):
        return jnp.mean(runner.model(p, pos, dirs) ** 2)

    timeit("model fwd", jax.jit(lambda p: runner.model(p, pos, dirs)),
           runner.params)
    timeit("model fwd+bwd", jax.jit(jax.grad(loss)), runner.params)
