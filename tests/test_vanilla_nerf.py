"""Vanilla NeRF (FrequencyEncoder + OriginNeRFNetworks) through the full
runner — SURVEY.md §7 milestone 2 (the zero-custom-kernel slice)."""

import textwrap

import numpy as np
import pytest


@pytest.mark.slow
def test_vanilla_nerf_trains(tmp_path, synthetic_scene, fresh_cfg):
    import jax

    from jnerf_tpu.models.losses import img2mse, mse2psnr
    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.config import init_cfg

    cfg_file = tmp_path / "nerf_smoke.py"
    cfg_file.write_text(textwrap.dedent(f"""
        exp_name = "nerf_smoke"
        log_dir = {str(tmp_path / 'logs')!r}
        sampler = dict(type='DensityGridSampler', update_den_freq=16)
        encoder = dict(
            pos_encoder=dict(type='FrequencyEncoder', multires=6),
            dir_encoder=dict(type='FrequencyEncoder', multires=3),
        )
        model = dict(type='OriginNeRFNetworks', D=3, W=96)
        loss = dict(type='HuberLoss', delta=0.1)
        optim = dict(type='Adam', lr=5e-3, eps=1e-15, betas=(0.9, 0.99))
        ema = dict(type='EMA', decay=0.95)
        expdecay = dict(type='ExpDecay', decay_start=20000, decay_interval=10000,
                        decay_base=0.33, decay_end=None)
        dataset = dict(
            train=dict(type='NerfDataset', root_dir={synthetic_scene!r},
                       batch_size=256, mode='train'),
            val=dict(type='NerfDataset', root_dir={synthetic_scene!r},
                     batch_size=256, mode='val', preload_shuffle=False),
            test=dict(type='NerfDataset', root_dir={synthetic_scene!r},
                      batch_size=256, mode='test', preload_shuffle=False),
        )
        tot_train_steps = 250
        background_color = [0, 0, 0]
        cone_angle_constant = 0.00390625
        near_distance = 0.2
        n_rays_per_batch = 256
        n_training_steps = 16
        target_batch_size = 1 << 14
        const_dt = True
        fp16 = False
        load_ckpt = False
        ckpt_path = None
        alpha_image = False
        grid_size = 32
        nerf_steps = 128
        seed = 0
    """))
    init_cfg(str(cfg_file))
    runner = Runner()
    runner.render_chunk_rays = 1024

    freq = runner.sampler.update_den_freq
    for i in range(250):
        runner.cfg.m_training_step = i
        runner.key, ks, kg = jax.random.split(runner.key, 3)
        if i % freq == 0:
            runner._update_grid(i, kg)
        loss = runner._train_step(ks)
        if i % freq == freq - 1:
            runner.sampler.update_batch_rays()

    img, _, tar = runner.render_img(dataset_mode="val", img_id=0)
    psnr = float(mse2psnr(img2mse(np.asarray(img), np.asarray(tar))))
    print(f"vanilla NeRF val PSNR after 250 steps: {psnr:.2f}")
    assert psnr > 14.0, psnr
