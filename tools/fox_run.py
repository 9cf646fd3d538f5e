"""Fox real-capture quality runs (VERDICT r4 #4).

`/root/reference/data/fox` (50 jpgs, COLMAP transforms with k1/k2/p1/p2
distortion, aabb_scale 4) is the only non-procedural data available here,
and the reference trains it via `projects/ngp/configs/ngp_fox.py`.  This
tool trains this repo's fox config (`projects/ngp/configs/ngp_fox.py`,
reachable through the same `_base_` machinery as the reference's) and
banks the two quality artifacts:

  --mode ceiling  long run  -> logs/ceiling_fox.json (trajectory + peak)
  --mode budget   5-min run -> logs/quality/psnr300_fox.json

Eval: the 2 held-out frames from transforms_test.json (1080x1920), PSNR
in the trainer's composited space against a mid-grey background (the fox
capture has no alpha; targets are opaque photographs, so this is plain
MSE on RGB).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="ceiling", choices=["ceiling", "budget"])
    ap.add_argument("--steps", type=int, default=16384,
                    help="ceiling-mode training steps")
    ap.add_argument("--eval-every", type=int, default=4096)
    ap.add_argument("--budget-s", type=float, default=300.0)
    ap.add_argument("--warmup-steps", type=int, default=256,
                    help="budget mode: steps excluded to absorb compiles")
    ap.add_argument("--encoder", default="f8l4",
                    choices=["f2l16", "f4l8", "f8l4"])
    ap.add_argument("--fast-cap", type=int, default=0)
    ap.add_argument("--compact-m", type=int, default=0,
                    help="log2 of the compacted batch M (0 = padded)")
    ap.add_argument("--march-factor", type=int, default=2)
    ap.add_argument("--eval-scale", type=int, default=1,
                    help="downsample factor for eval renders (CPU smokes)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # sitecustomize re-forces JAX_PLATFORMS=axon; must be programmatic
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from jnerf_tpu.models.losses import img2mse, mse2psnr
    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.config import get_cfg, init_cfg

    os.chdir(REPO)  # config dataset_dir is repo-relative ("data/fox")
    init_cfg(os.path.join(REPO, "projects/ngp/configs/ngp_fox.py"))
    cfg = get_cfg()
    cfg.tot_train_steps = 1 << 30
    enc = {"f4l8": dict(hash_levels=8, hash_features=4),
           "f8l4": dict(hash_levels=4, hash_features=8),
           "f2l16": {}}[args.encoder]
    if enc:
        cfg.encoder.pos_encoder.update(
            n_levels=enc["hash_levels"],
            n_features_per_level=enc["hash_features"])
    if args.fast_cap:
        cfg.hashmap_fast_cap = args.fast_cap
    if args.compact_m:
        cfg.compacted_batch = 1 << args.compact_m
        cfg.march_budget_factor = args.march_factor

    runner = Runner()

    def eval_psnr():
        from jnerf_tpu.utils.registry import DATASETS, build_from_cfg

        if runner.dataset["test"] is None:
            runner.dataset["test"] = build_from_cfg(
                runner.cfg.dataset.test, DATASETS)
        ps = []
        n = 2
        s = args.eval_scale
        for img_id in range(n):
            if s == 1:
                img, _a, tar = runner.render_img(dataset_mode="test",
                                                 img_id=img_id)
            else:
                # strided-subsample eval for CPU smokes: render every s-th
                # pixel against the same-strided target
                ds = runner.dataset["test"]
                H, W = runner.H, runner.W
                ro, rd = ds.generate_rays_total_test(img_id)
                ro = np.asarray(ro).reshape(H, W, 3)[::s, ::s].reshape(-1, 3)
                rd = np.asarray(rd).reshape(H, W, 3)[::s, ::s].reshape(-1, 3)
                h2, w2 = (H + s - 1) // s, (W + s - 1) // s
                img, alpha = runner._render_rays_chunked(
                    jax.numpy.asarray(ro), jax.numpy.asarray(rd), h2, w2)
                tar_full = ds.image(img_id)[::s, ::s]
                bg = np.asarray(runner.background_color)
                tar = tar_full[..., :3] * tar_full[..., 3:] \
                    + bg * (1 - tar_full[..., 3:])
                img = img + bg * (1 - alpha)
            ps.append(float(mse2psnr(img2mse(
                np.asarray(img, np.float32), np.asarray(tar, np.float32)))))
        return float(np.mean(ps)), [round(p, 2) for p in ps]

    from bench_psnr import _git_rev

    t0 = time.perf_counter()
    trajectory = []
    if args.mode == "ceiling":
        i = 0
        while i < args.steps:
            nxt = min(args.steps, i + args.eval_every)
            loss = runner.train_range(i, nxt)
            float(jax.device_get(loss))
            i = nxt
            psnr, per_view = eval_psnr()
            trajectory.append({"iters": i, "psnr": round(psnr, 3),
                               "elapsed_s": round(
                                   time.perf_counter() - t0, 1)})
            print(f"[fox] iters={i} psnr={psnr:.3f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        final_psnr, per_view = eval_psnr()
        ceiling = max([final_psnr] + [t["psnr"] for t in trajectory])
        result = {
            "psnr_ceiling": round(ceiling, 2),
            "psnr_final": round(final_psnr, 2),
            "per_view_psnr": per_view,
            "iters": args.steps,
            "trajectory": trajectory,
        }
        default_out = os.path.join(REPO, "logs", "ceiling_fox.json")
    else:
        # Budget mode: warmup (compiles) excluded, like bench_psnr.py.
        loss = runner.train_range(0, args.warmup_steps)
        float(jax.device_get(loss))
        t0 = time.perf_counter()
        i = args.warmup_steps
        chunk = 512
        while time.perf_counter() - t0 < args.budget_s:
            loss = runner.train_range(i, i + chunk)
            float(jax.device_get(loss))
            i += chunk
        elapsed = time.perf_counter() - t0
        psnr, per_view = eval_psnr()
        iters = i - args.warmup_steps
        result = {
            "psnr_at_budget": round(psnr, 2),
            "per_view_psnr": per_view,
            "budget_s": args.budget_s,
            "iters": iters,
            "iters_per_s": round(iters / elapsed, 2),
        }
        default_out = os.path.join(REPO, "logs", "quality",
                                   "psnr300_fox.json")

    result.update({
        "encoder": args.encoder,
        "fast_cap": args.fast_cap or None,
        "compact": ((f"m=2^{args.compact_m},f={args.march_factor}")
                    if args.compact_m else None),
        "dataset": "fox-real-capture (reference mount, 50 train / 2 test)",
        "git_rev": _git_rev(REPO),
        "elapsed_s": round(time.perf_counter() - t0, 1),
        "backend": jax.default_backend(),
    })
    out_path = args.out or default_out
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp = out_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(result, f, indent=1)
    os.replace(tmp, out_path)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "trajectory"}))


if __name__ == "__main__":
    main()
