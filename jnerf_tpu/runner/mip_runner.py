"""Mip-NeRF runner: multi-level loop with coarse-loss weighting.

Parity target: `/root/reference/contrib/mipnerf/python/jnerf/runner/runner.py`
(MipRunner.train :57-106, per-level masked MSE with ``coarse_loss_mult``,
val every 2000 steps, 3072-ray test chunks).  The per-step pipeline (both
levels' sampling + MLP + compositing + loss + Adam) is one jitted function.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from jnerf_tpu.dataset.mip_dataset import namedtuple_map
from jnerf_tpu.models.losses import img2mse, mse2psnr
from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import DATASETS, NETWORKS, OPTIMS, SAMPLERS, build_from_cfg


class MipRunner:
    def __init__(self):
        cfg = get_cfg()
        self.cfg = cfg
        self.exp_name = cfg.exp_name
        self.dataset = {
            "train": build_from_cfg(cfg.dataset.train, DATASETS),
            "val": build_from_cfg(cfg.dataset.val, DATASETS),
            "test": build_from_cfg(cfg.dataset.test, DATASETS),
        }
        cfg.dataset_obj = self.dataset["train"]
        self.model = build_from_cfg(cfg.model, NETWORKS)
        cfg.model_obj = self.model
        self.sampler = build_from_cfg(cfg.sampler, SAMPLERS)
        cfg.sampler_obj = self.sampler

        adam = build_from_cfg(cfg.optim, OPTIMS)
        self.schedule_wrap = build_from_cfg(
            cfg.linearlog, OPTIMS, nested_optimizer=adam
        )
        self.tx = self.schedule_wrap.make()

        self.tot_train_steps = cfg.tot_train_steps
        self.num_levels = cfg.num_levels or 2
        self.coarse_loss_mult = cfg.coarse_loss_mult or 0.1
        self.disable_multiscale_loss = bool(cfg.disable_multiscale_loss)
        self.chunk = 3072

        self.save_path = os.path.join(cfg.log_dir or "./logs", self.exp_name)
        os.makedirs(self.save_path, exist_ok=True)
        self.ckpt_path = cfg.ckpt_path or os.path.join(self.save_path, "params.pkl")

        self.key = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 20200823)
        self.key, init_key = jax.random.split(self.key)
        self.params = self.model.init(init_key)
        self.opt_state = self.tx.init(self.params)
        self.start = 0
        if cfg.load_ckpt:
            self.load_ckpt(self.ckpt_path)
        cfg.m_training_step = 0
        self._train_jit = None
        self._render_jit = None

    # ------------------------------------------------------------------ core
    def _levels_forward(self, params, rays, key, randomized):
        """Run all levels; returns [(rgb, distance, acc), ...]."""
        ret = []
        t_vals, weights = None, None
        for lvl in range(self.num_levels):
            key, k_s, k_n = jax.random.split(key, 3)
            enc, vdirs, t_vals = self.sampler.sample(
                rays, lvl, t_vals, weights, key=k_s, randomized=randomized
            )
            raw_rgb, raw_density = self.model(params, enc, vdirs)
            rgb, dist, acc, weights = self.sampler.rays2rgb(
                rays, raw_rgb, raw_density, t_vals, key=k_n,
                randomized=randomized,
            )
            ret.append((rgb, dist, acc))
        return ret

    def _step_body(self):
        tx = self.tx
        coarse_mult = self.coarse_loss_mult
        disable_ms = self.disable_multiscale_loss

        def step(params, opt_state, rays, rgb_target, key):
            mask = jnp.ones_like(rays.lossmult) if disable_ms else rays.lossmult

            def loss_fn(p):
                ret = self._levels_forward(p, rays, key, randomized=True)
                losses = [
                    jnp.sum(mask * (rgb - rgb_target[..., :3]) ** 2)
                    / jnp.sum(mask)
                    for (rgb, _, _) in ret
                ]
                loss = coarse_mult * sum(losses[:-1]) + losses[-1]
                return loss, losses[-1]

            (loss, fine_mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss, fine_mse

        return step

    def _build_train_step(self):
        return jax.jit(self._step_body(), donate_argnums=(0, 1))

    def _build_train_window(self, length: int):
        """jit of `length` chained steps (host dispatch is ~58 ms/call on
        this harness; a per-step loop is dispatch-bound at ~17 it/s —
        docs/DESIGN.md round-3 ledger).  The optax schedule lives in
        opt_state's count, so no per-step scalars need stacking; ray
        batches stack as a pytree scanned over axis 0."""
        step_fn = self._step_body()

        def window(params, opt_state, rays, rgb_targets, keys):
            def body(carry, x):
                p, o = carry
                r, t, k = x
                p, o, loss, fine = step_fn(p, o, r, t, k)
                return (p, o), loss

            (p, o), losses = jax.lax.scan(
                body, (params, opt_state), (rays, rgb_targets, keys),
                length=length,
            )
            return p, o, losses[-1]

        return jax.jit(window, donate_argnums=(0, 1))

    _WINDOW = 16
    _VAL_FREQ = 2000

    def train(self):
        from tqdm import tqdm

        window_cache = {}
        i = self.start
        bar = tqdm(total=self.tot_train_steps - self.start)
        loss = None
        while i < self.tot_train_steps:
            n = min(self._WINDOW,
                    self._VAL_FREQ - (i % self._VAL_FREQ) or self._VAL_FREQ,
                    self.tot_train_steps - i)
            self.cfg.m_training_step = i
            batches = [next(self.dataset["train"]) for _ in range(n)]
            rays = jax.tree.map(lambda *xs: jnp.stack(xs),
                                *[b[0] for b in batches])
            targets = jnp.stack([b[1] for b in batches])
            self.key, k_win = jax.random.split(self.key)
            if n not in window_cache:
                window_cache[n] = self._build_train_window(n)
            self.params, self.opt_state, loss = window_cache[n](
                self.params, self.opt_state, rays, targets,
                jax.random.split(k_win, n),
            )
            i += n
            bar.update(n)
            if i < self.tot_train_steps and i % self._VAL_FREQ == 0:
                psnr = mse2psnr(self.val_img(i))
                print(f"STEP={i} | LOSS={float(loss):.5f} | "
                      f"VAL PSNR={float(psnr):.3f}")
        self.save_ckpt(self.ckpt_path)

    # ------------------------------------------------------------- rendering
    def render_image(self, dataset, img_idx):
        if self._render_jit is None:
            def fwd(params, rays, key):
                ret = self._levels_forward(params, rays, key, randomized=False)
                return ret[-1][0], ret[-1][2]

            self._render_jit = jax.jit(fwd)
        rays_img = dataset.rays_for_image(img_idx)
        flat = namedtuple_map(lambda r: r.reshape(-1, r.shape[-1]), rays_img)
        n = flat.origins.shape[0]
        chunks = []
        pad = (-n) % self.chunk
        padded = namedtuple_map(
            lambda r: jnp.concatenate([r, jnp.ones((pad, r.shape[-1]), r.dtype)]),
            flat,
        )
        for s in range(0, n + pad, self.chunk):
            part = namedtuple_map(lambda r: r[s : s + self.chunk], padded)
            rgb, _acc = self._render_jit(self.params, part, jax.random.PRNGKey(0))
            chunks.append(np.asarray(rgb))
        H, W = dataset._images[img_idx].shape[:2]
        return np.concatenate(chunks)[:n].reshape(H, W, 3)

    def val_img(self, it):
        ds = self.dataset["val"]
        idx = np.random.randint(ds.n_images)
        img = self.render_image(ds, idx)
        tar = ds.image(idx)
        tar = tar[..., :3] * tar[..., 3:] if tar.shape[-1] == 4 else tar[..., :3]
        from PIL import Image

        Image.fromarray(
            (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
        ).save(os.path.join(self.save_path, f"img{it}.png"))
        return img2mse(jnp.asarray(img), jnp.asarray(tar))

    def test(self, load_ckpt=False):
        if load_ckpt:
            self.load_ckpt(self.ckpt_path)
        ds = self.dataset["test"]
        mse_list = []
        for i in range(ds.n_images):
            img = self.render_image(ds, i)
            tar = ds.image(i)
            tar = tar[..., :3] * tar[..., 3:] if tar.shape[-1] == 4 else tar[..., :3]
            mse_list.append(float(img2mse(jnp.asarray(img), jnp.asarray(tar))))
        psnr = float(np.mean([mse2psnr(m) for m in mse_list]))
        print(f"TOTAL TEST PSNR===={psnr}")
        return psnr

    # ------------------------------------------------------------ checkpoint
    def save_ckpt(self, path):
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "global_step": self.cfg.m_training_step,
                    "model": jax.device_get(self.params),
                    "optimizer": jax.device_get(self.opt_state),
                },
                f,
            )

    def load_ckpt(self, path):
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.start = ckpt["global_step"]
        self.params = jax.tree.map(jnp.asarray, ckpt["model"])
        self.opt_state = jax.tree.map(jnp.asarray, ckpt["optimizer"])
