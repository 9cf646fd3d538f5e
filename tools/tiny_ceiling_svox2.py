"""Measure the svox2 e2e test scene's convergence ceiling (VERDICT r2 #7).

Runs the EXACT config of tests/test_svox2.py::TestSvox2EndToEnd (48^3 grid,
64x64 synthetic-spheres, batch 1024) far past the test's 600 iters and
records the PSNR trajectory, so the test's acceptance threshold can be a
fraction of a measured plateau instead of a smoke-grade constant.

CPU-able (the test runs on CPU); writes logs/tiny_ceiling_svox2.json.
"""

import argparse
import json
import os
import sys
import tempfile
import textwrap
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=600)
    ap.add_argument("--cpu", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from jnerf_tpu.dataset.synthetic import make_synthetic_scene
    from jnerf_tpu.runner.svox2_runner import Svox2Runner
    from jnerf_tpu.utils.config import init_cfg

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="svox2_ceiling_")
    scene = make_synthetic_scene(
        os.path.join(tmp, "spheres"), n_train=12, n_val=2, n_test=2, H=64, W=64
    )
    base = os.path.join(here, "projects", "svox2", "configs", "svox2_base.py")
    cfg_path = os.path.join(tmp, "svox2_ceiling.py")
    with open(cfg_path, "w") as f:
        f.write(textwrap.dedent(f"""
            _base_ = {base!r}
            exp_name = "svox2_ceiling"
            log_dir = {os.path.join(tmp, 'logs')!r}
            dataset_dir = {scene!r}
            dataset = dict(
                train=dict(root=dataset_dir, split='train'),
                test=dict(root=dataset_dir, split='test'),
            )
            model = dict(reso=48, radius=1.4)
            reso_list = [[48]*3]
            batch_size = 1024
            n_iters = {args.iters}
            render_n_samples = 192
            lr_sigma_delay_steps = 0
            seed = 0
        """))
    init_cfg(cfg_path)
    runner = Svox2Runner()

    t0 = time.perf_counter()
    trajectory = []
    i = 0
    while i < args.iters:
        runner.train(min(args.eval_every, args.iters - i))
        i += args.eval_every
        psnr = float(runner.eval_psnr(n_images=1))
        trajectory.append({"iters": i, "psnr": round(psnr, 3),
                           "elapsed_s": round(time.perf_counter() - t0, 1)})
        print(f"[svox2-ceiling] iters={i} psnr={psnr:.3f} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)

    out_path = os.path.join(here, "logs", "tiny_ceiling_svox2.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    result = {
        "psnr_ceiling": max(t["psnr"] for t in trajectory),
        "test_point_iters": 600,
        "trajectory": trajectory,
        "scene": "synthetic-spheres-64 (test fixture config)",
        "backend": jax.default_backend(),
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "trajectory"}))


if __name__ == "__main__":
    main()
