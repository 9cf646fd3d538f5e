"""Per-component step profiler (run on TPU or CPU).

Times: raw dispatch latency, ray march, model fwd, full train step, grid
update — each jitted and block_until_ready'd, steady-state medians.
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def bench_fn(fn, *args, n=10):
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def jax_block(x):
    import jax

    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--rays", type=int, default=4096)
    parser.add_argument("--samples", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg
    from jnerf_tpu.runner import Runner

    ngp_synthetic_cfg(n_images=8, H=256, W=256)
    runner = Runner()
    sampler = runner.sampler
    model = runner.model
    R, S = args.rays, args.samples
    key = jax.random.PRNGKey(0)

    # 0. dispatch latency
    noop = jax.jit(lambda x: x + 1)
    x = jnp.ones((8, 128))
    print(f"dispatch noop:      {bench_fn(noop, x)*1e3:8.2f} ms")

    # Prepare a grid state with realistic occupancy (~8%)
    state = sampler.init_state()
    bf = jax.random.uniform(key, state["bitfield"].shape) < 0.08
    state["bitfield"] = bf

    ds = runner.dataset["train"]
    img_ids, rays_o, rays_d, rgba = next(ds)
    rays_o, rays_d = rays_o[:R], rays_d[:R]

    march = jax.jit(lambda st, ro, rd, k: sampler.sample_fixed(st, ro, rd, k, S))
    samples = march(state, rays_o, rays_d, key)
    print(f"march {R}x{S}:   {bench_fn(march, state, rays_o, rays_d, key)*1e3:8.2f} ms")

    n = R * S
    pos = samples.positions.reshape(n, 3)
    dirs = samples.dirs.reshape(n, 3)
    fwd = jax.jit(lambda p, a, b: model(p, a, b))
    print(f"model fwd {n}:  {bench_fn(fwd, runner.params, pos, dirs)*1e3:8.2f} ms")

    def fwd_bwd(p, a, b):
        def loss(p):
            return jnp.mean(model(p, a, b) ** 2)
        return jax.grad(loss)(p)

    fb = jax.jit(fwd_bwd)
    print(f"model fwd+bwd:      {bench_fn(fb, runner.params, pos, dirs)*1e3:8.2f} ms")

    # full train step (fixed shape)
    step = runner._build_train_step(R, S)
    sampler.n_rays_per_batch = R
    sampler.n_samples_per_ray = S
    out = step(runner.params, runner.opt_state, runner.ema_state, state, key)
    jax_block(out)
    params, opt_state, ema_state, state2, _ = out

    def run_step(params, opt_state, ema_state, st, k):
        return step(params, opt_state, ema_state, st, k)

    ts = []
    for i in range(10):
        t0 = time.perf_counter()
        params, opt_state, ema_state, state2, loss = run_step(
            params, opt_state, ema_state, state2, jax.random.PRNGKey(i)
        )
        loss.block_until_ready()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"full train step:    {ts[len(ts)//2]*1e3:8.2f} ms")

    # grid update
    n_u, n_n = sampler.grid_update_counts(1000)
    gu = jax.jit(
        lambda p, st, k: sampler.update_density_grid_fn(p, st, k, n_u, n_n, False)
    )
    st3 = gu(params, state2, key)
    jax_block(st3)
    t0 = time.perf_counter()
    st3 = gu(params, st3, key)
    jax_block(st3)
    print(f"grid update:        {(time.perf_counter()-t0)*1e3:8.2f} ms (every 16 steps)")

    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
