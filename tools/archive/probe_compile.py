"""Profile what dominates the multichip dryrun's GSPMD compile.

MULTICHIP_r03 timed out (rc=124) at flagship shapes: the 8-device jit of
one train step took 4m17s+ to compile on the virtual CPU mesh.  This
probe builds the exact dryrun runner and times trace/lower vs XLA compile
for each dispatched program (grid update, train step), with switches to
bisect the step's sub-programs (compaction, hash backward, march size).

Usage: python tools/probe_compile.py [--no-compact] [--stop-grad-table]
       [--nerf-steps N] [--levels N] [--single-device]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--nerf-steps", type=int, default=1024)
    ap.add_argument("--levels", type=int, default=16)
    ap.add_argument("--features", type=int, default=2)
    ap.add_argument("--single-device", action="store_true")
    ap.add_argument("--skip-grid", action="store_true")
    ap.add_argument("--step-only", action="store_true",
                    help="only time the train step (skip executing grid)")
    args = ap.parse_args()

    n_dev = 1 if args.single_device else 8
    jax.config.update("jax_num_cpu_devices", n_dev)

    from jnerf_tpu.parallel import make_mesh, replicate_tree
    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

    cfg = ngp_synthetic_cfg(
        n_images=2, H=64, W=64,
        n_rays_per_batch=4096, target_batch_size=1 << 18,
        grid_size=128, nerf_steps=args.nerf_steps,
        hash_levels=args.levels, hash_features=args.features,
        log2_hashmap_size=19,
    )
    if not args.no_compact:
        cfg.compacted_batch = True
        cfg.march_budget_factor = 2

    t0 = time.time()
    runner = Runner()
    if n_dev > 1:
        runner.mesh = make_mesh(n_dev)
        runner.params = replicate_tree(runner.params, runner.mesh)
        runner.opt_state = replicate_tree(runner.opt_state, runner.mesh)
        runner.ema_state = replicate_tree(runner.ema_state, runner.mesh)
        runner.sampler.state = replicate_tree(runner.sampler.state,
                                              runner.mesh)
    print(f"[setup] {time.time()-t0:.1f}s  devices={n_dev}")

    key = jax.random.PRNGKey(0)
    runner.cfg.m_training_step = 300

    def timed_lower_compile(tag, jitted, *a):
        t0 = time.time()
        lowered = jitted.lower(*a)
        t_lower = time.time() - t0
        t0 = time.time()
        compiled = lowered.compile()
        t_compile = time.time() - t0
        print(f"[{tag}] lower {t_lower:.1f}s  compile {t_compile:.1f}s")
        return compiled

    if not args.skip_grid:
        n_u, n_n = runner.sampler.grid_update_counts(300)
        if (runner.cfg.grid_update_mode or "sweep") == "sweep":
            n_u = n_n = 0
        gfn = jax.jit(lambda p, s, k: runner.sampler.update_density_grid_fn(
            p, s, k, n_u, n_n, first_step=False))
        gc = timed_lower_compile("grid_update", gfn,
                                 runner.params, runner.sampler.state, key)
        if not args.step_only:
            t0 = time.time()
            runner.sampler.state = gc(runner.params, runner.sampler.state, key)
            jax.block_until_ready(runner.sampler.state)
            print(f"[grid_update] run {time.time()-t0:.1f}s")

    shape = (runner.sampler.n_rays_per_batch,
             runner.sampler.n_samples_per_ray)
    print(f"[step] shape R={shape[0]} S={shape[1]} "
          f"compact={runner.sampler.compacted_batch}")
    sfn = runner._build_train_step(*shape)
    sc = timed_lower_compile("train_step", sfn,
                             runner.params, runner.opt_state,
                             runner.ema_state, runner.sampler.state,
                             runner._train_data(), key)
    t0 = time.time()
    out = sc(runner.params, runner.opt_state, runner.ema_state,
             runner.sampler.state, runner._train_data(), key)
    jax.block_until_ready(out)
    print(f"[train_step] run {time.time()-t0:.1f}s loss={float(out[-1]):.5f}")


if __name__ == "__main__":
    main()
