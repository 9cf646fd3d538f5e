"""Recursive-NeRF mini-project: staged LOD training with anchor splitting.

Parity target: `/root/reference/contrib/Recursive-NeRF/run_nerf.py` —
stratified 64-sample rendering, staged deepening at step1/step2/step3,
k-means anchor splits from high-uncertainty points, uncertainty supervised
against per-ray error.  Runs on blender scenes or the in-repo analytic
scene (`--synthetic`; the original's datasets are unfetchable here).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datadir", default="")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--head-num", type=int, default=8)
    parser.add_argument("--n-iters", type=int, default=3000)
    parser.add_argument("--step1", type=int, default=500)
    parser.add_argument("--step2", type=int, default=1000)
    parser.add_argument("--step3", type=int, default=1500)
    parser.add_argument("--n-rand", type=int, default=1024)
    parser.add_argument("--n-samples", type=int, default=64)
    parser.add_argument("--lrate", type=float, default=5e-4)
    parser.add_argument("--threshold", type=float, default=3e-2)
    parser.add_argument("--width", type=int, default=256)
    parser.add_argument("--out", default="./logs/recursive_nerf")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from jnerf_tpu.models.networks.recursive_nerf import (
        RecursiveNeRF, split_anchors,
    )

    if args.synthetic or not args.datadir:
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "pixelnerf"))
        from main import make_synthetic

        images, poses, focal = make_synthetic(n_images=16, H=80, W=80)
    else:
        from jnerf_tpu.dataset.mip_dataset import Blender

        ds = Blender(args.datadir, batch_size=args.n_rand, mode="train")
        images = np.stack([im[..., :3] for im in ds._images])
        poses = np.stack([np.eye(4, dtype=np.float32)] * ds.n_images)  # unused
        focal = ds.focal

    H, W = images.shape[1:3]
    ys, xs = np.mgrid[0:H, 0:W]
    cam_dirs = np.stack(
        [(xs - W / 2 + 0.5) / focal, -(ys - H / 2 + 0.5) / focal,
         -np.ones_like(xs, np.float32)], -1,
    ).astype(np.float32)
    rays_o, rays_d, rgbs = [], [], []
    for i in range(len(images)):
        d = (cam_dirs @ poses[i][:3, :3].T).reshape(-1, 3)
        rays_d.append(d)
        rays_o.append(np.broadcast_to(poses[i][:3, 3], d.shape))
        rgbs.append(images[i].reshape(-1, 3))
    rays_o, rays_d, rgbs = map(np.concatenate, (rays_o, rays_d, rgbs))

    model = RecursiveNeRF(head_num=args.head_num, W=args.width,
                          threshold=args.threshold)
    key = jax.random.PRNGKey(0)
    key, k = jax.random.split(key)
    params = model.init(k)
    tx = optax.adam(args.lrate)
    opt_state = tx.init(params)

    near, far = 2.0, 6.0
    S = args.n_samples

    def render(p, ro, rd, kk, max_level):
        u = jax.random.uniform(kk, (S,)) / S
        z = near + (far - near) * (jnp.linspace(0, 1, S + 1)[:-1] + u)
        pts = ro[:, None, :] + rd[:, None, :] * z[None, :, None]
        views = jnp.repeat(rd, S, axis=0)
        raw, uncert = model(p, pts.reshape(-1, 3), views, max_level=max_level)
        raw = raw.reshape(-1, S, 4)
        uncert = uncert.reshape(-1, S)
        delta = jnp.concatenate([jnp.diff(z), jnp.asarray([1e10])])
        delta = delta[None, :] * jnp.linalg.norm(rd, axis=-1, keepdims=True)
        alpha = 1 - jnp.exp(-jax.nn.relu(raw[..., 3]) * delta)
        trans = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1 - alpha + 1e-7], -1),
            -1)[:, :-1]
        w = alpha * trans
        rgb = jnp.sum(w[..., None] * jax.nn.sigmoid(raw[..., :3]), -2)
        return rgb, uncert, pts.reshape(-1, 3)

    def make_step(max_level):
        def loss_fn(p, ro, rd, target, kk):
            rgb, uncert, _ = render(p, ro, rd, kk, max_level)
            err = jnp.mean((rgb - target) ** 2, axis=-1)
            mse = err.mean()
            # supervise per-sample uncertainty toward its ray's error
            u_loss = jnp.mean(
                (uncert - jax.lax.stop_gradient(err)[:, None]) ** 2
            )
            return mse + 0.1 * u_loss, mse

        @jax.jit
        def step(p, o, ro, rd, target, kk):
            (loss, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                p, ro, rd, target, kk)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, mse

        return step

    rng = np.random.default_rng(0)
    os.makedirs(args.out, exist_ok=True)
    stages = [(0, args.step1), (1, args.step2), (2, args.step3),
              (model.max_depth, args.n_iters)]
    steps = {lvl: make_step(min(lvl, model.max_depth)) for lvl, _ in stages}
    i = 0
    mses = []
    for lvl, until in stages:
        step = steps[lvl]
        while i < until:
            sel = rng.integers(0, len(rays_o), args.n_rand)
            key, kk = jax.random.split(key)
            params, opt_state, mse = step(
                params, opt_state, jnp.asarray(rays_o[sel]),
                jnp.asarray(rays_d[sel]), jnp.asarray(rgbs[sel]), kk)
            mses.append(float(mse))
            if i % 100 == 0:
                print(f"iter {i} (level {lvl}): mse={np.mean(mses[-50:]):.5f}",
                      flush=True)
            i += 1
        if until < args.n_iters:
            # Stage transition: split anchors by k-means on uncertain points.
            sel = rng.integers(0, len(rays_o), 2048)
            key, kk = jax.random.split(key)
            _rgb, uncert, pts = render(
                params, jnp.asarray(rays_o[sel]), jnp.asarray(rays_d[sel]),
                kk, min(lvl, model.max_depth))
            params = split_anchors(model, params, pts, uncert.reshape(-1))
            print(f"stage -> level {lvl+1}: anchors updated", flush=True)

    with open(os.path.join(args.out, "recursive_nerf.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    print("saved", os.path.join(args.out, "recursive_nerf.pkl"))


if __name__ == "__main__":
    main()
