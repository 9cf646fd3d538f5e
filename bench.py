"""Benchmark: steady-state Instant-NGP training throughput (iters/s).

Headline metric mirrors the reference's README claim of ~133 iters/s on an
RTX 3090 (`/root/reference/README.md:114`, BASELINE.md) at ngp_base scale:
4096 rays/batch, 2^18 target samples/batch, 128^3 x 5-cascade occupancy
grid, 16-level 2^19 hash table, bf16 MLPs.

The blender-lego fixture cannot be downloaded here (zero egress), so the
run uses the in-memory SyntheticSpheresDataset whose post-convergence
occupancy (~a centered object at lego-like fill rate) drives the same
sampling workload.  Prints ONE JSON line.
"""

import argparse
import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ITERS_PER_S = 133.0  # JNeRF-NGP on RTX 3090 (README.md:114)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cpu", action="store_true", help="force CPU (debug)")
    parser.add_argument("--warmup", type=int, default=512)
    parser.add_argument("--steps", type=int, default=256)
    parser.add_argument("--image-size", type=int, default=512)
    parser.add_argument("--encoder", default="f4l8",
                        choices=["f2l16", "f4l8"])
    args = parser.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg
    from jnerf_tpu.runner import Runner

    enc = (dict(hash_levels=8, hash_features=4)
           if args.encoder == "f4l8" else {})
    ngp_synthetic_cfg(
        n_images=16,
        H=args.image_size,
        W=args.image_size,
        tot_train_steps=args.warmup + args.steps,
        **enc,
    )
    from jnerf_tpu.utils.metrics import ThroughputMeter

    runner = Runner()
    freq = runner.sampler.update_den_freq
    meter = ThroughputMeter(window=args.steps)

    def run_steps(start, n, tick=False):
        loss = None
        for i in range(start, start + n):
            runner.cfg.m_training_step = i
            runner.key, k_step, k_grid = jax.random.split(runner.key, 3)
            if i % freq == 0:
                runner._update_grid(i, k_grid)
            loss = runner._train_step(k_step)
            if tick:
                meter.tick(
                    n_rays=runner.sampler.n_rays_per_batch,
                    n_samples=runner.sampler.n_rays_per_batch
                    * runner.sampler.n_samples_per_ray,
                )
            if i % freq == freq - 1:
                runner.sampler.update_batch_rays()
        return loss

    # Warmup: compiles + occupancy-grid convergence + batch-shape settling.
    run_steps(0, args.warmup).block_until_ready()

    meter.tick()  # arm the meter's clock at the window start
    t0 = time.perf_counter()
    run_steps(args.warmup, args.steps, tick=True).block_until_ready()
    elapsed = time.perf_counter() - t0

    iters_per_s = args.steps / elapsed
    # meter tracks the (possibly adapting) per-step ray/sample counts; the
    # wall clock for rates is the blocking window above (dispatch is async).
    mean_rays = sum(meter.rays) / max(len(meter.rays), 1)
    rays_per_s = iters_per_s * mean_rays
    result = {
        "metric": "ngp_train_iters_per_s",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / BASELINE_ITERS_PER_S, 3),
        "extra": {
            "rays_per_s": round(rays_per_s),
            "n_rays_per_batch": runner.sampler.n_rays_per_batch,
            "samples_per_ray": runner.sampler.n_samples_per_ray,
            "elapsed_s": round(elapsed, 2),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
