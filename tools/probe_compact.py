"""In-step A/B of the ragged-compaction path (round 3).

Times the full train window (scan-chained, device-true: memory rule — the
~58 ms/call axon dispatch makes per-step timing lie) at bench scale for
padded vs compacted configurations, across encoder shapes and march
budget factors.  Writes one JSON line per config to stdout.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def time_window(r, reps=6):
    import jax

    freq = r.sampler.update_den_freq
    n_rays = r.sampler.n_rays_per_batch
    n_samp = r.sampler.n_samples_per_ray
    shape = (n_rays, n_samp, freq)
    if shape not in r._train_window_cache:
        r._train_window_cache[shape] = r._build_train_window(*shape)
    fn = r._train_window_cache[shape]

    def run_once():
        keys = jax.random.split(r.key, freq)
        (r.params, r.opt_state, r.ema_state, r.sampler.state, loss) = fn(
            r.params, r.opt_state, r.ema_state, r.sampler.state,
            r._train_data(), keys)
        return loss

    run_once()  # compile
    float(jax.device_get(run_once()))
    t0 = time.perf_counter()
    loss = None
    for _ in range(reps):
        loss = run_once()
    float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / (reps * freq)
    return dt, n_rays, n_samp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="f8l4")
    ap.add_argument("--steps", type=int, default=512,
                    help="warm-up training steps before timing (so the "
                         "grid/batch shapes reach steady state)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--only", default="",
                    help="comma-separated config labels to run")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

    enc = {"f4l8": dict(hash_levels=8, hash_features=4),
           "f8l4": dict(hash_levels=4, hash_features=8),
           "f2l16": {}}[args.encoder]

    all_configs = [
        ("padded", {}),
        # f=1 with M = R*S skips compaction entirely (same as padded).
        ("compact_f2", dict(compacted_batch=True, march_budget_factor=2)),
        ("compact_f4", dict(compacted_batch=True, march_budget_factor=4)),
        # Speed mode: half the model-tier batch (M=2^17) — trains on
        # ~2x today's effective samples (the padded path only keeps ~26%
        # of slots) at ~half the model-tier cost.
        ("compact_m17_f2", dict(compacted_batch=131072,
                                march_budget_factor=2)),
        # Speed mode, march factor 1: same [R, S] march as padded, model
        # tier on M = 2^17 / 2^16 kept samples.  At the measured ~26%
        # occupancy, M=2^16 trains on ~the same REAL samples as the padded
        # 2^18-slot batch at ~1/4 its model-tier cost (round-4 flagship
        # candidate; slight global-cap truncation like the reference's).
        ("compact_m17_f1", dict(compacted_batch=131072,
                                march_budget_factor=1)),
        ("compact_m16_f1", dict(compacted_batch=65536,
                                march_budget_factor=1)),
    ]
    if args.only:
        names = set(args.only.split(","))
        all_configs = [c for c in all_configs if c[0] in names]
    for label, knobs in all_configs:
        cfg = ngp_synthetic_cfg(n_images=16, H=512, W=512,
                                tot_train_steps=100000, **enc)
        for k, v in knobs.items():
            setattr(cfg, k, v)
        r = Runner()
        r.train_range(0, args.steps)
        dt, n_rays, n_samp = time_window(r)
        print(json.dumps({
            "config": label, "encoder": args.encoder,
            "ms_per_step": round(dt * 1e3, 2),
            "iters_per_s": round(1.0 / dt, 2),
            "n_rays": n_rays, "n_samples": n_samp,
        }), flush=True)


if __name__ == "__main__":
    main()
