"""Accurate TPU train-step timing (flushed output, no captured constants)."""

import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg
    from jnerf_tpu.runner import Runner

    ngp_synthetic_cfg(n_images=8, H=256, W=256)
    runner = Runner()
    sampler = runner.sampler
    key = jax.random.PRNGKey(0)
    log(f"backend={jax.default_backend()} K={sampler.march_config.n_candidates} "
        f"stride={sampler.march_config.probe_stride}")

    # Bring the grid to a realistic state: a few update cycles + steps.
    t0 = time.perf_counter()
    runner._update_grid(0, key)
    occ = float(runner.sampler.state["bitfield"][0].mean())
    log(f"first grid update (compile+run): {time.perf_counter()-t0:.1f}s occ={occ:.3f}")

    def do_step(k):
        return runner._train_step(k)

    t0 = time.perf_counter()
    loss = do_step(key)
    _ = float(loss)
    log(f"first train step (compile+run): {time.perf_counter()-t0:.1f}s")

    for trial in range(3):
        t0 = time.perf_counter()
        n = 20
        for i in range(n):
            loss = do_step(jax.random.PRNGKey(i))
        _ = float(loss)
        dt = (time.perf_counter() - t0) / n
        log(f"steady train step ({sampler.n_rays_per_batch}x"
            f"{sampler.n_samples_per_ray}): {dt*1e3:.1f} ms -> {1/dt:.1f} it/s")

    # grid update steady
    n_u, n_n = sampler.grid_update_counts(1000)
    t0 = time.perf_counter()
    runner._update_grid(1000, key)
    _ = float(runner.sampler.state["mean"])
    log(f"grid update (compile+run, {n_u}+{n_n}): {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    runner._update_grid(1016, key)
    _ = float(runner.sampler.state["mean"])
    log(f"grid update steady: {(time.perf_counter()-t0)*1e3:.1f} ms (every 16 steps)")

    # component: march only
    ds = runner.dataset["train"]
    _, rays_o, rays_d, _ = next(ds)
    R, S = sampler.n_rays_per_batch, sampler.n_samples_per_ray
    rays_o, rays_d = rays_o[:R], rays_d[:R]
    march = jax.jit(lambda st, ro, rd, k: sampler.sample_fixed(st, ro, rd, k, S))
    s = march(sampler.state, rays_o, rays_d, key)
    _ = float(jnp.sum(s.positions))
    t0 = time.perf_counter()
    for i in range(10):
        s = march(sampler.state, rays_o, rays_d, jax.random.PRNGKey(i))
    _ = float(jnp.sum(s.positions))
    log(f"march: {(time.perf_counter()-t0)/10*1e3:.1f} ms")

    # component: model fwd+bwd on the samples
    pos = s.positions.reshape(-1, 3)
    dirs = s.dirs.reshape(-1, 3)

    def fwd_loss(p, a, b):
        return jnp.mean(runner.model(p, a, b) ** 2)

    fb = jax.jit(jax.grad(fwd_loss))
    g = fb(runner.params, pos, dirs)
    _ = float(jnp.sum(g["density_mlp"][0]["w"]))
    t0 = time.perf_counter()
    for _ in range(10):
        g = fb(runner.params, pos, dirs)
    _ = float(jnp.sum(g["density_mlp"][0]["w"]))
    log(f"model fwd+bwd {pos.shape[0]}: {(time.perf_counter()-t0)/10*1e3:.1f} ms")


if __name__ == "__main__":
    main()
