"""Equal-iterations quality A/B: reference-exact XOR hashing vs the TPU
linear-hash paths (VERDICT r1: 'the hash deviation has a number, not a
claim').  Small scale so the slow xor path is tractable on CPU; both arms
train the same scene, steps, seeds.  Prints one JSON line per arm."""

import json
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from jnerf_tpu.models.losses import img2mse, mse2psnr
from jnerf_tpu.utils.bench_cfg import ngp_synthetic_cfg

def _flag(name, default):
    return int(next((a.split("=")[1] for a in sys.argv
                     if a.startswith(f"--{name}=")), default))


STEPS = _flag("steps", 600)
H = _flag("size", 96)
LOG2 = _flag("log2", 15)
LEVELS = _flag("levels", 8)
RAYS = _flag("rays", 1024)

for indexing in ("linear_rows", "xor"):
    cfg = ngp_synthetic_cfg(
        n_images=8, H=H, W=H, n_rays_per_batch=RAYS,
        target_batch_size=RAYS * 32, grid_size=64, nerf_steps=256,
        hash_levels=LEVELS, log2_hashmap_size=LOG2, tot_train_steps=STEPS,
    )
    cfg.hash_indexing = indexing
    from jnerf_tpu.runner import Runner

    runner = Runner()
    freq = runner.sampler.update_den_freq
    for i in range(STEPS):
        runner.cfg.m_training_step = i
        runner.key, k_step, k_grid = jax.random.split(runner.key, 3)
        if i % freq == 0:
            runner._update_grid(i, k_grid)
        loss = runner._train_step(k_step)
        if i % freq == freq - 1:
            runner.sampler.update_batch_rays()
    psnrs = []
    for img_id in range(min(2, runner.dataset["val"].n_images)):
        img, _a, tar = runner.render_img(dataset_mode="val", img_id=img_id)
        psnrs.append(float(mse2psnr(img2mse(
            np.asarray(img, np.float32), np.asarray(tar, np.float32)))))
    print(json.dumps({
        "hash_indexing": indexing,
        "steps": STEPS,
        "size": H,
        "log2": LOG2,
        "levels": LEVELS,
        "psnr": round(float(np.mean(psnrs)), 2),
        "per_view": [round(p, 2) for p in psnrs],
    }), flush=True)
