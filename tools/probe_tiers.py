"""Round-4 tier decomposition of the compacted flagship train step.

Times scan-chained (dispatch-amortized, device-true) windows of each tier
at the runner's steady-state shapes:

  full      the production 16-step train window
  march     ray gen + sample_fixed (+ compact_indices when compacted)
  model_f   model forward on the [M] compacted batch
  model_fb  model forward+backward on [M]
  comp_fb   compacted compositing + loss fwd+bwd (model outputs fixed)
  optim     adam update + EMA step on fixed grads

Budget identity is approximate (tiers re-run shared prologues), but the
ranking tells us where the next milliseconds live (VERDICT r3 #8).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_timer(fn, operands, reps=16, trials=4):
    """Median seconds per iteration of fn chained `reps` times via scan."""
    import jax
    import jax.numpy as jnp

    def window(args, keys):
        def body(carry, k):
            return fn(carry, k), ()

        out, _ = jax.lax.scan(body, args, keys, length=reps)
        return out

    def sync(out):
        # device_get of one output leaf: the only sync the axon relay
        # honors (block_until_ready is a no-op there — measured).  The
        # scan is one executable, so any output waits for all of it.
        jax.device_get(jax.tree.leaves(out)[0])

    win = jax.jit(window)
    keys = jax.random.split(jax.random.PRNGKey(0), reps)
    sync(win(operands, keys))
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        out = win(operands, keys)
        sync(out)
        ts.append((time.perf_counter() - t0) / reps)
    ts.sort()
    return ts[len(ts) // 2]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="f8l4")
    ap.add_argument("--scene", default="spheres")
    ap.add_argument("--compact-m", type=int, default=16)
    ap.add_argument("--march-factor", type=int, default=1)
    ap.add_argument("--fast-cap", type=int, default=0,
                    help="hashed-level table cap in entries (0 = shipped "
                         "default; 524288 = the reference's 2^19)")
    ap.add_argument("--steps", type=int, default=768,
                    help="warmup steps to reach steady shapes")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.dataset.dataset import rays_from_pixels
    from jnerf_tpu.ops.compact import compact_indices, render_rays_compact
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
    if args.fast_cap:
        cfg.hashmap_fast_cap = args.fast_cap
    runner = Runner()
    loss = runner.train_range(0, args.steps)
    float(jax.device_get(loss))

    sampler = runner.sampler
    R, S = sampler.n_rays_per_batch, sampler.n_samples_per_ray
    ds = runner.dataset["train"]
    n_pixels = ds.n_images * ds.H * ds.W
    data = runner._train_data()
    model = runner.model
    params = runner.params
    grid_state = sampler.state
    results = {"shapes": f"R={R} S={S} M={m}"}
    print(results["shapes"], flush=True)

    # --- full production window
    freq = sampler.update_den_freq
    shape = (R, S, freq)
    if shape not in runner._train_window_cache:
        runner._train_window_cache[shape] = runner._build_train_window(*shape)
    win = runner._train_window_cache[shape]

    def run_full():
        keys = jax.random.split(runner.key, freq)
        out = win(runner.params, runner.opt_state, runner.ema_state,
                  sampler.state, data, keys)
        (runner.params, runner.opt_state, runner.ema_state,
         sampler.state, loss) = out
        return loss

    run_full()
    float(jax.device_get(run_full()))
    t0 = time.perf_counter()
    for _ in range(4):
        loss = run_full()
    float(jax.device_get(loss))
    results["full"] = (time.perf_counter() - t0) / (4 * freq)
    print(f"full: {results['full'] * 1e3:.2f} ms", flush=True)
    params = runner.params
    grid_state = sampler.state

    # --- march tier (+ compaction indexing)
    def march_fn(carry, k):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (R,), 0, n_pixels)
        _ids, ro, rd = rays_from_pixels(
            idx, data["transforms"], data["focal"], data["pp"], ds.W, ds.H)
        s = sampler.sample_fixed(grid_state, ro, rd, k2, S)
        acc = jnp.sum(s.dts) + jnp.sum(s.positions[:, :, 0])
        if m:
            info = compact_indices(s.valid, m)
            acc = acc + jnp.sum(info.idx.astype(jnp.float32))
        return carry + acc

    results["march"] = scan_timer(march_fn, jnp.zeros(()))
    print(f"march(+compact): {results['march'] * 1e3:.2f} ms", flush=True)

    # Fixed compacted batch for the model tiers.
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    idx = jax.random.randint(k1, (R,), 0, n_pixels)
    _ids, ro, rd = rays_from_pixels(
        idx, data["transforms"], data["focal"], data["pp"], ds.W, ds.H)
    s = sampler.sample_fixed(grid_state, ro, rd, k2, S)
    if m:
        info = compact_indices(s.valid, m)
        pos_c = s.positions.reshape(-1, 3)[info.idx]
        dirs_c = s.dirs.reshape(-1, 3)[info.idx]
        dts_c = jnp.where(info.slot_valid, s.dts.reshape(-1)[info.idx], 0.0)
    else:
        pos_c = s.positions.reshape(-1, 3)
        dirs_c = s.dirs.reshape(-1, 3)
        dts_c = s.dts.reshape(-1)

    def model_f(carry, k):
        raw = model(params, pos_c + carry * 0.0, dirs_c)
        return carry + jnp.sum(raw.astype(jnp.float32)) * 1e-9

    results["model_f"] = scan_timer(model_f, jnp.zeros(()))
    print(f"model fwd [M]: {results['model_f'] * 1e3:.2f} ms", flush=True)

    def model_fb(carry, k):
        def lf(p):
            raw = model(p, pos_c + carry * 0.0, dirs_c)
            return jnp.mean(raw.astype(jnp.float32) ** 2)

        g = jax.grad(lf)(params)
        return carry + jax.tree.leaves(g)[0].astype(jnp.float32).sum() * 1e-9

    results["model_fb"] = scan_timer(model_fb, jnp.zeros(()))
    print(f"model fwd+bwd [M]: {results['model_fb'] * 1e3:.2f} ms", flush=True)

    if m:
        raw_fix = model(params, pos_c, dirs_c)
        bg = jnp.full((R, 3), 0.3)
        tgt = jnp.full((R, 3), 0.5)

        def comp_fb(carry, k):
            def lf(r):
                rgb, _ = render_rays_compact(r, dts_c, info, background=bg)
                return jnp.mean((rgb - tgt) ** 2)

            g = jax.grad(lf)(raw_fix)
            return carry + jnp.sum(g) * 1e-9

        results["comp_fb"] = scan_timer(comp_fb, jnp.zeros(()))
        print(f"composite+loss fwd+bwd: {results['comp_fb'] * 1e3:.2f} ms",
              flush=True)

    # --- optimizer tier
    grads = jax.tree.map(jnp.zeros_like, params)
    tx, ema = runner.tx, runner.ema

    def optim_fn(carry, k):
        p, o, e = carry
        up, o = tx.update(grads, o, p)
        p = jax.tree.map(lambda a, b: a + b, p, up)
        if ema is not None:
            p, e = ema.step(p, e)
        return (p, o, e)

    import copy

    def scan_timer3(fn, operands):
        return scan_timer(fn, operands)

    results["optim"] = scan_timer3(
        optim_fn, (params, runner.opt_state, runner.ema_state))
    print(f"adam+ema: {results['optim'] * 1e3:.2f} ms", flush=True)

    print(json.dumps({k: (round(v * 1e3, 2) if isinstance(v, float) else v)
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
