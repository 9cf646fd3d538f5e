"""Measure steady-state sample demand + compaction-cap truncation.

The compacted flagship's bg-term rule (`render_rays_compact`,
apply_bg_on_truncated=False — reference `calc_rgb.h:68-71`) assumes cap
truncation is RARE.  This probes whether it is: trains to steady state,
then reports per-batch demand, slot occupancy, the fraction of rays
truncated by the M cap, and the fraction of real samples dropped by it.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="f8l4")
    ap.add_argument("--scene", default="hard")
    ap.add_argument("--compact-m", type=int, default=16)
    ap.add_argument("--march-factor", type=int, default=1)
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.ops.compact import compact_indices
    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

    enc = {"f4l8": dict(hash_levels=8, hash_features=4),
           "f8l4": dict(hash_levels=4, hash_features=8),
           "f2l16": {}}[args.encoder]
    cfg = ngp_synthetic_cfg(
        n_images=16, H=512, W=512, tot_train_steps=1 << 30,
        scene=args.scene, ssaa=2 if args.scene == "hard" else 1,
        n_val=4 if args.scene == "hard" else 2, **enc)
    m = (1 << args.compact_m) if args.compact_m else None
    if m:
        cfg.compacted_batch = m
        cfg.march_budget_factor = args.march_factor
    runner = Runner()
    loss = runner.train_range(0, args.steps)
    float(jax.device_get(loss))

    # Per-window adaptation trace: is the (R, S) loop converged or
    # limit-cycling?  Print the post-window measured demand the next
    # adaptation will act on.
    sampler = runner.sampler
    freq = sampler.update_den_freq
    i = args.steps
    for w in range(24):
        loss = runner.train_range(i, i + freq)
        float(jax.device_get(loss))
        i += freq
        measured = int(jax.device_get(
            sampler.state["measured_batch_size"]))
        print(f"window {w}: R={sampler.n_rays_per_batch} "
              f"S={sampler.n_samples_per_ray} "
              f"stride={sampler.march_config.probe_stride} "
              f"measured/step={measured // freq}", flush=True)
    R, S = sampler.n_rays_per_batch, sampler.n_samples_per_ray
    print(f"steady shapes: R={R} S={S} slots={R * S} M={m}")

    for trial in range(4):
        key = jax.random.PRNGKey(1000 + trial)
        k1, k2 = jax.random.split(key)
        data = runner._train_data()
        n_pixels = (runner.dataset["train"].n_images *
                    runner.dataset["train"].H * runner.dataset["train"].W)
        idx = jax.random.randint(k1, (R,), 0, n_pixels)
        from jnerf_tpu.dataset.dataset import rays_from_pixels

        _ids, rays_o, rays_d = rays_from_pixels(
            idx, data["transforms"], data["focal"], data["pp"],
            runner.dataset["train"].W, runner.dataset["train"].H)
        samples = sampler.sample_fixed(sampler.state, rays_o, rays_d, k2, S)
        valid = np.asarray(samples.valid)
        count = np.asarray(samples.count)  # uncapped demand per ray
        kept = valid.astype(np.int64).cumprod(axis=1).sum(axis=1)
        total_kept = int(kept.sum())
        stats = {
            "slot_occupancy": round(float(valid.mean()), 4),
            "kept_samples": total_kept,
            "demand_sum": int(count.sum()),
            "rays_S_truncated": round(float((count > S).mean()), 4),
            "mean_demand_per_ray": round(float(count.mean()), 2),
        }
        if m:
            info = compact_indices(jnp.asarray(valid), m)
            trunc = np.asarray(info.truncated)
            offs = np.asarray(info.offsets)
            dropped = max(0, int(offs[-1]) - m)
            stats.update({
                "rays_cap_truncated": round(float(trunc.mean()), 4),
                "samples_dropped_by_cap": dropped,
                "frac_samples_dropped": round(dropped / max(total_kept, 1), 4),
            })
        print(stats, flush=True)


if __name__ == "__main__":
    main()
