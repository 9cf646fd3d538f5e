"""pixelNeRF mini-project: train image-conditioned NeRF from few views.

Parity target: `/root/reference/contrib/pixelnerf/main.py` (3 reference
views, 2048-ray batches, Adam 1e-4, bound (2, 6), 64 coarse samples).
The tiny-nerf npz fixture is unfetchable here; `--synthetic` renders the
in-repo analytic scene instead (same camera conventions).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def load_tiny_nerf(path):
    z = np.load(path)
    return z["images"], z["poses"], float(z["focal"])


def make_synthetic(n_images=24, H=100, W=100):
    from jnerf_tpu.dataset.synthetic import _look_at_pose, render_analytic

    cax = 0.6911112070083618
    rng = np.random.default_rng(0)
    images, poses = [], []
    for i in range(n_images):
        th = 2 * np.pi * i / n_images
        ph = np.radians(rng.uniform(-5, 40))
        eye = 4.0 * np.array([np.cos(th) * np.cos(ph), np.sin(th) * np.cos(ph),
                              np.sin(ph)])
        pose = _look_at_pose(eye)
        img = render_analytic(pose, H, W, cax)
        images.append(img[..., :3] * img[..., 3:])  # black background
        poses.append(np.concatenate([pose, [[0, 0, 0, 1]]], 0))
    focal = 0.5 * W / np.tan(0.5 * cax)
    return np.stack(images).astype(np.float32), np.stack(poses).astype(np.float32), focal


class ReferenceProjector:
    """Project world points into reference views and sample conv features
    (Dataset.py's feature_matching)."""

    def __init__(self, encoder, enc_params, ref_images, ref_poses, focal):
        import jax.numpy as jnp

        self.feats = encoder(enc_params, jnp.asarray(ref_images))  # [n,h,w,C]
        self.w2c = jnp.asarray(np.linalg.inv(ref_poses))  # [n, 4, 4]
        self.focal = focal
        self.H, self.W = ref_images.shape[1:3]

    def __call__(self, pts):
        import jax.numpy as jnp

        from jnerf_tpu.models.networks.pixelnerf import bilinear_sample

        R, S, _ = pts.shape
        flat = pts.reshape(-1, 3)
        outs = []
        fh, fw = self.feats.shape[1:3]
        sx, sy = fw / self.W, fh / self.H
        for i in range(self.feats.shape[0]):
            cam = flat @ self.w2c[i, :3, :3].T + self.w2c[i, :3, 3]
            # OpenGL camera: looks down -z.
            z = -cam[:, 2]
            u = (cam[:, 0] / jnp.maximum(z, 1e-6)) * self.focal + self.W / 2
            v = (-cam[:, 1] / jnp.maximum(z, 1e-6)) * self.focal + self.H / 2
            f = bilinear_sample(self.feats[i], jnp.stack([u * sx, v * sy], -1))
            outs.append(f)
        return jnp.stack(outs).reshape(len(outs), R, S, -1)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", default="", help="tiny_nerf_data.npz path")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--n-ref", type=int, default=3)
    parser.add_argument("--epochs", type=int, default=10)
    parser.add_argument("--batch", type=int, default=2048)
    parser.add_argument("--out", default="./logs/pixelnerf")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from jnerf_tpu.models.networks.pixelnerf import (
        ImageEncoder, PixelNeRF, render_rays_pixelnerf,
    )

    if args.data:
        images, poses, focal = load_tiny_nerf(args.data)
    else:
        images, poses, focal = make_synthetic()
    H, W = images.shape[1:3]
    n_ref = args.n_ref

    encoder = ImageEncoder()
    net = PixelNeRF(img_f_ch=encoder.out_channels)
    key = jax.random.PRNGKey(999)
    k1, k2, key = jax.random.split(key, 3)
    params = {"enc": encoder.init(k1), "net": net.init(k2)}

    projector = None  # built per param update below

    # Rays for all non-reference training images.
    ys, xs = np.mgrid[0:H, 0:W]
    cam_dirs = np.stack(
        [(xs - W * 0.5 + 0.5) / focal, -(ys - H * 0.5 + 0.5) / focal,
         -np.ones_like(xs, np.float32)], -1,
    ).astype(np.float32)
    rays_o, rays_d, rgbs = [], [], []
    for i in range(n_ref, len(images)):
        d = cam_dirs @ poses[i][:3, :3].T
        rays_d.append(d.reshape(-1, 3))
        rays_o.append(np.broadcast_to(poses[i][:3, 3], d.reshape(-1, 3).shape))
        rgbs.append(images[i].reshape(-1, 3))
    rays_o = np.concatenate(rays_o)
    rays_d = np.concatenate(rays_d)
    rgbs = np.concatenate(rgbs)

    tx = optax.adam(1e-4)
    opt_state = tx.init(params)
    ref_images = jnp.asarray(images[:n_ref])
    ref_poses = poses[:n_ref]

    def loss_fn(p, ro, rd, target, k):
        proj = ReferenceProjector(
            ImageEncoder(), p["enc"], ref_images, ref_poses, focal
        )
        rgb, _, _ = render_rays_pixelnerf(
            net, p["net"], ro, rd, (2.0, 6.0), 64, proj, key=k
        )
        return jnp.mean((rgb - target) ** 2)

    @jax.jit
    def step(p, o, ro, rd, target, k):
        loss, grads = jax.value_and_grad(loss_fn)(p, ro, rd, target, k)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)
    steps_per_epoch = max(1, len(rays_o) // args.batch)
    for ep in range(args.epochs):
        losses = []
        for _ in range(steps_per_epoch):
            sel = rng.integers(0, len(rays_o), args.batch)
            key, k = jax.random.split(key)
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(rays_o[sel]),
                jnp.asarray(rays_d[sel]), jnp.asarray(rgbs[sel]), k,
            )
            losses.append(float(loss))
        print(f"epoch {ep}: loss={np.mean(losses):.5f}", flush=True)

    import pickle

    with open(os.path.join(args.out, "pixelnerf.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print("saved", os.path.join(args.out, "pixelnerf.pkl"))


if __name__ == "__main__":
    main()
