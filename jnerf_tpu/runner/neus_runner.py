"""NeuS training runner: per-image ray batches, color/eikonal/mask losses,
cosine LR with warmup, periodic image/mesh validation, auto-resume.

Parity target: `/root/reference/python/jnerf/runner/neus_runner.py`.
TPU-first: the whole iteration (ray gen happens host-side like the
reference, but render + losses + Adam update is ONE jitted function with
scalar lr/anneal inputs, so nothing recompiles across the schedule).
"""

from __future__ import annotations

import logging
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import optax

from jnerf_tpu.utils.config import get_cfg
from jnerf_tpu.utils.registry import DATASETS, NETWORKS, OPTIMS, SAMPLERS, build_from_cfg


class NeuSRunner:
    def __init__(self, mode="train", is_continue=False):
        cfg = get_cfg()
        self.cfg = cfg
        self.base_exp_dir = cfg.base_exp_dir
        os.makedirs(self.base_exp_dir, exist_ok=True)
        self.iter_step = 0

        self.end_iter = cfg.end_iter
        self.save_freq = cfg.save_freq
        self.report_freq = cfg.report_freq
        self.val_freq = cfg.val_freq
        self.val_mesh_freq = cfg.val_mesh_freq
        self.batch_size = cfg.batch_size
        self.validate_resolution_level = cfg.validate_resolution_level
        self.learning_rate = cfg.optim.lr
        self.learning_rate_alpha = cfg.learning_rate_alpha
        self.use_white_bkgd = cfg.use_white_bkgd
        self.warm_up_end = cfg.warm_up_end
        self.anneal_end = cfg.anneal_end
        self.igr_weight = cfg.igr_weight
        self.mask_weight = cfg.mask_weight
        self.mode = mode

        self.dataset = build_from_cfg(cfg.dataset, DATASETS)
        self.neus_network = build_from_cfg(cfg.model, NETWORKS)
        self.renderer = build_from_cfg(cfg.render, SAMPLERS)
        self.renderer.set_neus_network(self.neus_network)

        adam_cfg = build_from_cfg(cfg.optim, OPTIMS)
        # LR is injected per step (cosine w/ warmup, `neus_runner.py:152-160`),
        # so the transform itself is unit-scaled.
        self.tx = optax.chain(
            optax.scale_by_adam(
                b1=adam_cfg.betas[0], b2=adam_cfg.betas[1], eps=adam_cfg.eps
            ),
            optax.scale(-1.0),
        )

        self.key = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
        self.key, init_key = jax.random.split(self.key)
        self.params = self.neus_network.init(init_key)
        self.opt_state = self.tx.init(self.params)
        self._train_step_jit = None

        if is_continue:
            ckpt_dir = os.path.join(self.base_exp_dir, "checkpoints")
            names = [
                n for n in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else [])
                if n.endswith(".pkl") and int(n[5:-4]) <= self.end_iter
            ]
            if names:
                latest = sorted(names)[-1]
                logging.info("Find checkpoint: %s", latest)
                self.load_checkpoint(latest)

    # ---------------------------------------------------------------- sched
    def get_cos_anneal_ratio(self):
        if self.anneal_end == 0.0:
            return 1.0
        return min(1.0, self.iter_step / self.anneal_end)

    def current_lr(self):
        if self.iter_step < self.warm_up_end:
            factor = self.iter_step / self.warm_up_end
        else:
            a = self.learning_rate_alpha
            progress = (self.iter_step - self.warm_up_end) / (
                self.end_iter - self.warm_up_end
            )
            factor = (np.cos(np.pi * progress) + 1.0) * 0.5 * (1 - a) + a
        return self.learning_rate * factor

    # ---------------------------------------------------------------- train
    def _step_body(self):
        renderer = self.renderer
        tx = self.tx
        igr_w, mask_w = self.igr_weight, self.mask_weight
        use_white = self.use_white_bkgd

        def step(params, opt_state, rays_o, rays_d, true_rgb, mask, near, far,
                 lr, anneal, key):
            bg = jnp.ones((1, 3)) if use_white else None
            if mask_w > 0.0:
                mask = (mask > 0.5).astype(jnp.float32)
            else:
                mask = jnp.ones_like(mask)
            mask_sum = jnp.sum(mask) + 1e-5

            def loss_fn(p):
                out = renderer.render(
                    p, rays_o, rays_d, near, far, key=key,
                    background_rgb=bg, cos_anneal_ratio=anneal,
                )
                color_err = (out["color_fine"] - true_rgb) * mask
                color_loss = jnp.sum(jnp.abs(color_err)) / mask_sum
                eik = out["gradient_error"]
                w_sum = jnp.clip(out["weight_sum"], 1e-3, 1.0 - 1e-3)
                mask_loss = jnp.mean(
                    -(mask * jnp.log(w_sum) + (1 - mask) * jnp.log(1 - w_sum))
                )
                total = color_loss + eik * igr_w + mask_loss * mask_w
                return total, (color_loss, eik, out["s_val"].mean())

            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            updates = jax.tree.map(lambda u: u * lr, updates)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state, loss, aux

        return step

    def _build_train_step(self):
        return jax.jit(self._step_body(), donate_argnums=(0, 1))

    def _build_train_window(self, length: int):
        """jit of `length` chained steps (lax.scan over stacked per-step
        inputs).  Host dispatch costs ~58 ms/call on this harness — a
        per-step loop is dispatch-bound at ~17 it/s no matter how fast the
        device step is (docs/DESIGN.md round-3 ledger), so steps are
        chained between host events exactly like `Runner._train_window`."""
        step_fn = self._step_body()

        def window(params, opt_state, data, nears, fars, lrs, anneals, keys):
            def body(carry, x):
                p, o = carry
                d, near, far, lr, an, k = x
                p, o, loss, aux = step_fn(
                    p, o, d[:, :3], d[:, 3:6], d[:, 6:9], d[:, 9:10],
                    near, far, lr, an, k,
                )
                return (p, o), loss

            (p, o), losses = jax.lax.scan(
                body, (params, opt_state),
                (data, nears, fars, lrs, anneals, keys), length=length,
            )
            return p, o, losses[-1]

        return jax.jit(window, donate_argnums=(0, 1))

    _WINDOW = 16

    def train(self):
        from tqdm import tqdm

        image_perm = np.random.permutation(self.dataset.n_images)
        window_cache = {}
        bar = tqdm(total=self.end_iter - self.iter_step)

        while self.iter_step < self.end_iter:
            # Window length: up to the next host event (report/save/val
            # boundaries and end_iter all truncate it).
            n = self._WINDOW
            for freq in (self.report_freq, self.save_freq, self.val_freq,
                         self.val_mesh_freq, len(image_perm)):
                n = min(n, freq - (self.iter_step % freq) or freq)
            n = max(1, min(n, self.end_iter - self.iter_step))

            data, nears, fars, lrs, anneals = [], [], [], [], []
            for j in range(n):
                step = self.iter_step + j
                img_idx = int(image_perm[step % len(image_perm)])
                d = self.dataset.gen_random_rays_at(img_idx, self.batch_size)
                near, far = self.dataset.near_far_from_sphere(
                    d[:, :3], d[:, 3:6]
                )
                data.append(d)
                nears.append(near)
                fars.append(far)
                save_step = self.iter_step
                self.iter_step = step
                lrs.append(self.current_lr())
                anneals.append(self.get_cos_anneal_ratio())
                self.iter_step = save_step
            self.key, k_win = jax.random.split(self.key)

            if n not in window_cache:
                window_cache[n] = self._build_train_window(n)
            self.params, self.opt_state, loss = window_cache[n](
                self.params, self.opt_state,
                jnp.stack(data), jnp.stack(nears), jnp.stack(fars),
                jnp.asarray(lrs, jnp.float32),
                jnp.asarray(anneals, jnp.float32),
                jax.random.split(k_win, n),
            )
            self.iter_step += n
            bar.update(n)

            if self.iter_step % self.report_freq == 0:
                print(f"iter:{self.iter_step:8d} loss = {float(loss):.5f} "
                      f"lr={self.current_lr():.6f}")
            if self.iter_step % self.save_freq == 0:
                self.save_checkpoint()
            if self.iter_step % self.val_freq == 0:
                self.validate_image()
            if self.iter_step % self.val_mesh_freq == 0:
                self.validate_mesh()
            if self.iter_step % len(image_perm) == 0:
                image_perm = np.random.permutation(self.dataset.n_images)

    # ----------------------------------------------------------- checkpoint
    def save_checkpoint(self):
        os.makedirs(os.path.join(self.base_exp_dir, "checkpoints"), exist_ok=True)
        ckpt = {"neus": jax.device_get(self.params), "iter_step": self.iter_step}
        path = os.path.join(
            self.base_exp_dir, "checkpoints", f"ckpt_{self.iter_step:06d}.pkl"
        )
        with open(path, "wb") as f:
            pickle.dump(ckpt, f)

    def load_checkpoint(self, checkpoint_name):
        path = os.path.join(self.base_exp_dir, "checkpoints", checkpoint_name)
        with open(path, "rb") as f:
            ckpt = pickle.load(f)
        self.params = jax.tree.map(jnp.asarray, ckpt["neus"])
        self.iter_step = ckpt["iter_step"]

    # ------------------------------------------------------------- validate
    def _render_rays_batched(self, rays_o, rays_d, want_aux=False):
        outs_rgb, outs_n, outs_d = [], [], []
        n = rays_o.shape[0]
        bg = jnp.ones((1, 3)) if self.use_white_bkgd else None
        n_total = self.renderer.n_samples + self.renderer.n_importance
        for i in range(0, n, self.batch_size):
            ro = rays_o[i : i + self.batch_size]
            rd = rays_d[i : i + self.batch_size]
            near, far = self.dataset.near_far_from_sphere(ro, rd)
            out = self.renderer.render(
                self.params, ro, rd, near, far, perturb_overwrite=0,
                background_rgb=bg, cos_anneal_ratio=self.get_cos_anneal_ratio(),
            )
            outs_rgb.append(np.asarray(out["color_fine"]))
            if want_aux:
                w = np.asarray(out["weights"])[:, :n_total]
                inside = np.asarray(out["inside_sphere"])
                normals = np.asarray(out["gradients"]) * (w * inside)[..., None]
                depths = np.asarray(out["z_vals"]) * w * inside
                outs_n.append(normals.sum(1))
                outs_d.append(depths.sum(1))
        rgb = np.concatenate(outs_rgb, axis=0)
        if not want_aux:
            return rgb, None, None
        return rgb, np.concatenate(outs_n), np.concatenate(outs_d)

    def validate_image(self, idx=-1, resolution_level=-1):
        import cv2 as cv

        if idx < 0:
            idx = np.random.randint(self.dataset.n_images)
        if resolution_level < 0:
            resolution_level = self.validate_resolution_level
        print(f"Validate: iter: {self.iter_step}, camera: {idx}")
        rays_o, rays_d = self.dataset.gen_rays_at(idx, resolution_level)
        H, W, _ = rays_o.shape
        rgb, normals, depths = self._render_rays_batched(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3), want_aux=True
        )
        for sub in ("validations_fine", "normals", "depths"):
            os.makedirs(os.path.join(self.base_exp_dir, sub), exist_ok=True)
        img = (rgb.reshape(H, W, 3) * 256).clip(0, 255).astype(np.uint8)
        gt = self.dataset.image_at(idx, resolution_level)
        cv.imwrite(
            os.path.join(self.base_exp_dir, "validations_fine",
                         f"{self.iter_step:08d}_0_{idx}.png"),
            np.concatenate([img[..., ::-1], gt[..., ::-1]]),
        )
        rot = np.linalg.inv(np.asarray(self.dataset.pose_all[idx][:3, :3]))
        nimg = (np.matmul(rot[None], normals[:, :, None]).reshape(H, W, 3)
                * 128 + 128).clip(0, 255).astype(np.uint8)
        cv.imwrite(
            os.path.join(self.base_exp_dir, "normals",
                         f"{self.iter_step:08d}_0_{idx}.png"), nimg,
        )
        dimg = cv.applyColorMap(
            (depths.reshape(H, W) * 255).clip(0, 255).astype(np.uint8),
            cv.COLORMAP_JET,
        )
        cv.imwrite(
            os.path.join(self.base_exp_dir, "depths",
                         f"{self.iter_step:08d}_0_{idx}.png"), dimg,
        )
        return img

    def render_novel_image(self, idx_0, idx_1, ratio, resolution_level):
        rays_o, rays_d = self.dataset.gen_rays_between(
            idx_0, idx_1, ratio, resolution_level
        )
        H, W, _ = rays_o.shape
        rgb, _, _ = self._render_rays_batched(
            rays_o.reshape(-1, 3), rays_d.reshape(-1, 3)
        )
        return (rgb.reshape(H, W, 3) * 256).clip(0, 255).astype(np.uint8)

    def validate_mesh(self, world_space=False, resolution=64, threshold=0.0):
        from jnerf_tpu.ops.marching import write_ply

        vertices, triangles = self.renderer.extract_geometry(
            self.params, self.dataset.object_bbox_min,
            self.dataset.object_bbox_max, resolution=resolution,
            threshold=threshold,
        )
        out_dir = os.path.join(self.base_exp_dir, f"meshes_{resolution}")
        os.makedirs(out_dir, exist_ok=True)
        if world_space:
            scale_mat = self.dataset.scale_mats_np[0]
            vertices = vertices * scale_mat[0, 0] + scale_mat[:3, 3][None]
        path = os.path.join(out_dir, f"{self.iter_step:08d}.ply")
        write_ply(path, vertices, triangles)
        logging.info("End")
        return path
