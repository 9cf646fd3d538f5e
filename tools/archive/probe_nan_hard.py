"""Round-4 NaN hunt: f8l4+m16f1 on the hard scene NaN'd its ceiling run.

Trains short windows at bench scale printing loss, then checks params and
one val render for NaN.  Knobs isolate scene (hard vs spheres) and
compaction (m16f1 vs padded).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="f8l4")
    ap.add_argument("--scene", default="hard")
    ap.add_argument("--compact-m", type=int, default=16)
    ap.add_argument("--march-factor", type=int, default=1)
    ap.add_argument("--steps", type=int, default=1024)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--no-matmul", action="store_true",
                    help="route all levels through the RMW scatter loop "
                         "(bisect: did the round-3 matmul scatter kernel "
                         "corrupt gradients?)")
    args = ap.parse_args()

    if args.no_matmul:
        import jnerf_tpu.ops.hash_nbr as H

        H.MATMUL_ROWS_MAX = 0

    import jax
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.models.losses import img2mse, mse2psnr
    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

    enc = {"f4l8": dict(hash_levels=8, hash_features=4),
           "f8l4": dict(hash_levels=4, hash_features=8),
           "f2l16": {}}[args.encoder]
    cfg = ngp_synthetic_cfg(
        n_images=16, H=512, W=512, tot_train_steps=1 << 30,
        scene=args.scene, ssaa=2 if args.scene == "hard" else 1,
        n_val=4 if args.scene == "hard" else 2, **enc)
    if args.compact_m:
        cfg.compacted_batch = 1 << args.compact_m
        cfg.march_budget_factor = args.march_factor
    runner = Runner()

    def health():
        import jax.numpy as jnp

        g = runner.sampler.state["density_grid"]
        occ = runner.sampler.state["bitfield"]
        fin = all(bool(jnp.isfinite(v).all())
                  for v in jax.tree.leaves(runner.params))
        return (f"R={runner.sampler.n_rays_per_batch} "
                f"S={runner.sampler.n_samples_per_ray} "
                f"grid_nan={not bool(jnp.isfinite(g).all())} "
                f"grid_max={float(jnp.nanmax(g)):.3g} "
                f"occ={float(occ[0].mean()):.3f} params_finite={fin}")

    t0 = time.perf_counter()
    i = 0
    while i < args.steps:
        nxt = min(args.steps, i + 128)
        loss = runner.train_range(i, nxt)
        lv = float(jax.device_get(loss))
        print(f"step {nxt}: loss={lv:.6f} ({time.perf_counter()-t0:.0f}s) "
              + health(), flush=True)
        i = nxt
        if not np.isfinite(lv):
            break

    bad = [k for k, v in jax.tree_util.tree_leaves_with_path(runner.params)
           if not bool(jax.numpy.isfinite(v).all())]
    print("non-finite param leaves:", [jax.tree_util.keystr(k) for k in bad]
          if bad else "none", flush=True)

    img, _a, tar = runner.render_img(dataset_mode="val", img_id=0)
    img = np.asarray(img, np.float32)
    tar = np.asarray(tar, np.float32)
    print("render nan:", np.isnan(img).any(), "tar nan:", np.isnan(tar).any(),
          "img range:", img.min(), img.max(), flush=True)
    print("psnr:", float(mse2psnr(img2mse(img, tar))), flush=True)


if __name__ == "__main__":
    main()
