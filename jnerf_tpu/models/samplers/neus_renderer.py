"""NeuS SDF volume renderer: sigmoid-CDF importance sampling + s-density
compositing, pure JAX.

Parity target: `/root/reference/python/jnerf/models/samplers/neus_render/renderer.py`
(``sample_pdf`` :40-70, ``render_core_outside`` :96-135, ``up_sample``
:137-181, ``cat_z_vals`` :183-197, ``render_core`` :199-292, ``render``
:294-393).  Everything is static-shape (the 4 up-sample rounds are an
unrolled Python loop over fixed 16-sample batches) so the whole render jits
into one XLA program; the SDF spatial gradients come from vmap(grad) and
remain differentiable for the eikonal term (double backward).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from jnerf_tpu.utils.registry import SAMPLERS


def sample_pdf(key, bins, weights, n_samples, det=False):
    """Inverse-CDF sampling (`renderer.py:40-70`). bins [R, B+1]? No —
    matches the reference: bins [R, B], weights [R, B-1]... here bins and
    weights both [R, B] with weights over bins; CDF over the bin axis."""
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, -1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # [R, B+1]
    if det:
        u = jnp.linspace(0.5 / n_samples, 1.0 - 0.5 / n_samples, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)
    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bins_b = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), -1)
    bins_a = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), -1)
    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_b) / denom
    return bins_b + t * (bins_a - bins_b)


def _cumprod_exclusive(alpha):
    """T_i = prod_{j<i} (1 - alpha_j + 1e-6), weights = alpha * T."""
    t = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-6], -1
        ),
        -1,
    )[..., :-1]
    return alpha * t


@SAMPLERS.register_module()
class NeuSRenderer:
    def __init__(self, n_samples, n_importance, n_outside, up_sample_steps,
                 perturb):
        self.network = None  # set via set_neus_network
        self.n_samples = n_samples
        self.n_importance = n_importance
        self.n_outside = n_outside
        self.up_sample_steps = up_sample_steps
        self.perturb = perturb

    def set_neus_network(self, neus_network):
        self.network = neus_network

    # ------------------------------------------------------------ pieces
    def up_sample(self, params, rays_o, rays_d, z_vals, sdf, n_importance,
                  inv_s):
        """Importance sampling from the sigmoid-CDF alpha (`:137-181`)."""
        batch, n = z_vals.shape
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
        radius = jnp.linalg.norm(pts, axis=-1)
        inside = (radius[:, :-1] < 1.0) | (radius[:, 1:] < 1.0)
        prev_sdf, next_sdf = sdf[:, :-1], sdf[:, 1:]
        prev_z, next_z = z_vals[:, :-1], z_vals[:, 1:]
        mid_sdf = (prev_sdf + next_sdf) * 0.5
        cos_val = (next_sdf - prev_sdf) / (next_z - prev_z + 1e-5)
        prev_cos = jnp.concatenate([jnp.zeros((batch, 1)), cos_val[:, :-1]], -1)
        cos_val = jnp.minimum(prev_cos, cos_val)
        cos_val = jnp.clip(cos_val, -1e3, 0.0) * inside

        dist = next_z - prev_z
        prev_esti = mid_sdf - cos_val * dist * 0.5
        next_esti = mid_sdf + cos_val * dist * 0.5
        prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
        next_cdf = jax.nn.sigmoid(next_esti * inv_s)
        alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
        weights = _cumprod_exclusive(alpha)
        return jax.lax.stop_gradient(
            sample_pdf(None, z_vals, weights, n_importance, det=True)
        )

    def cat_z_vals(self, params, rays_o, rays_d, z_vals, new_z_vals, sdf,
                   last=False):
        batch, n = z_vals.shape
        pts = rays_o[:, None, :] + rays_d[:, None, :] * new_z_vals[..., None]
        z_all = jnp.concatenate([z_vals, new_z_vals], -1)
        order = jnp.argsort(z_all, axis=-1)
        z_all = jnp.take_along_axis(z_all, order, axis=-1)
        if not last:
            new_sdf = self.network.sdf_network.sdf(
                params["sdf"], pts.reshape(-1, 3)
            ).reshape(batch, -1)
            sdf = jnp.concatenate([sdf, new_sdf], -1)
            sdf = jnp.take_along_axis(sdf, order, axis=-1)
        return z_all, sdf

    def render_core_outside(self, params, rays_o, rays_d, z_vals, sample_dist,
                            background_rgb=None):
        """NeRF++ background over inverted-sphere coords (`:96-135`)."""
        batch, n = z_vals.shape
        dists = jnp.concatenate(
            [z_vals[..., 1:] - z_vals[..., :-1],
             jnp.full((batch, 1), sample_dist)], -1,
        )
        mid_z = z_vals + dists * 0.5
        pts = rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]
        dis = jnp.clip(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1.0, 1e5)
        pts4 = jnp.concatenate([pts / dis, 1.0 / dis], -1)
        dirs = jnp.broadcast_to(rays_d[:, None, :], pts.shape)

        density, color = self.network.nerf_outside(
            params["nerf"], pts4.reshape(-1, 4), dirs.reshape(-1, 3)
        )
        color = jax.nn.sigmoid(color).reshape(batch, n, 3)
        alpha = 1.0 - jnp.exp(
            -jax.nn.softplus(density.reshape(batch, n)) * dists
        )
        weights = _cumprod_exclusive(alpha)
        out_color = jnp.sum(weights[..., None] * color, axis=1)
        if background_rgb is not None:
            out_color = out_color + background_rgb * (
                1.0 - jnp.sum(weights, -1, keepdims=True)
            )
        return {"color": out_color, "sampled_color": color, "alpha": alpha}

    def render_core(self, params, rays_o, rays_d, z_vals, sample_dist,
                    background_alpha=None, background_sampled_color=None,
                    background_rgb=None, cos_anneal_ratio=0.0):
        """s-density compositing + eikonal loss (`:199-292`)."""
        batch, n = z_vals.shape
        net = self.network
        dists = jnp.concatenate(
            [z_vals[..., 1:] - z_vals[..., :-1],
             jnp.full((batch, 1), sample_dist)], -1,
        )
        mid_z = z_vals + dists * 0.5
        pts = (rays_o[:, None, :] + rays_d[:, None, :] * mid_z[..., None]).reshape(-1, 3)
        dirs = jnp.broadcast_to(rays_d[:, None, :], (batch, n, 3)).reshape(-1, 3)

        sdf_out = net.sdf_network(params["sdf"], pts)
        sdf = sdf_out[:, :1]
        feature = sdf_out[:, 1:]
        gradients = net.sdf_network.gradient(params["sdf"], pts)
        sampled_color = net.color_network(
            params["color"], pts, gradients, dirs, feature
        ).reshape(batch, n, 3)

        inv_s = jnp.clip(net.deviation_network.inv_s(params["variance"]), 1e-6, 1e6)
        true_cos = jnp.sum(dirs * gradients, -1, keepdims=True)
        # Annealed non-positive cos estimator (`:237-240`).
        iter_cos = -(
            jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
            + jax.nn.relu(-true_cos) * cos_anneal_ratio
        )
        est_next = sdf + iter_cos * dists.reshape(-1, 1) * 0.5
        est_prev = sdf - iter_cos * dists.reshape(-1, 1) * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = jnp.clip(
            ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).reshape(batch, n),
            0.0, 1.0,
        )

        pts_norm = jnp.linalg.norm(pts, axis=-1).reshape(batch, n)
        inside = jax.lax.stop_gradient((pts_norm < 1.0).astype(jnp.float32))
        relax_inside = jax.lax.stop_gradient((pts_norm < 1.2).astype(jnp.float32))

        if background_alpha is not None:
            alpha = alpha * inside + background_alpha[:, :n] * (1.0 - inside)
            alpha = jnp.concatenate([alpha, background_alpha[:, n:]], -1)
            sampled_color = (
                sampled_color * inside[..., None]
                + background_sampled_color[:, :n] * (1.0 - inside)[..., None]
            )
            sampled_color = jnp.concatenate(
                [sampled_color, background_sampled_color[:, n:]], axis=1
            )

        weights = _cumprod_exclusive(alpha)
        weights_sum = jnp.sum(weights, -1, keepdims=True)
        color = jnp.sum(sampled_color * weights[..., None], axis=1)
        if background_rgb is not None:
            color = color + background_rgb * (1.0 - weights_sum)

        grad_err = (jnp.linalg.norm(gradients.reshape(batch, n, 3), axis=-1) - 1.0) ** 2
        grad_err = jnp.sum(relax_inside * grad_err) / (jnp.sum(relax_inside) + 1e-5)

        return {
            "color": color,
            "sdf": sdf,
            "gradients": gradients.reshape(batch, n, 3),
            "s_val": 1.0 / inv_s,
            "alpha": alpha,
            "weights": weights,
            "cdf": prev_cdf.reshape(batch, n),
            "gradient_error": grad_err,
            "inside_sphere": inside,
        }

    # ------------------------------------------------------------ render
    def render(self, params, rays_o, rays_d, near, far, key=None,
               perturb_overwrite=-1, background_rgb=None, cos_anneal_ratio=0.0):
        batch = rays_o.shape[0]
        sample_dist = 2.0 / self.n_samples
        z_vals = near + (far - near) * jnp.linspace(0.0, 1.0, self.n_samples)[None, :]

        perturb = self.perturb if perturb_overwrite < 0 else perturb_overwrite
        z_vals_outside = None
        if self.n_outside > 0:
            z_vals_outside = jnp.linspace(
                1e-3, 1.0 - 1.0 / (self.n_outside + 1.0), self.n_outside
            )
        if perturb > 0:
            assert key is not None, "perturbed rendering needs a PRNG key"
            k1, k2 = jax.random.split(key)
            t_rand = jax.random.uniform(k1, (batch, 1)) - 0.5
            z_vals = z_vals + t_rand * 2.0 / self.n_samples
            if self.n_outside > 0:
                mids = 0.5 * (z_vals_outside[1:] + z_vals_outside[:-1])
                upper = jnp.concatenate([mids, z_vals_outside[-1:]])
                lower = jnp.concatenate([z_vals_outside[:1], mids])
                t_r = jax.random.uniform(k2, (batch, self.n_outside))
                z_vals_outside = lower[None, :] + (upper - lower)[None, :] * t_r
        if self.n_outside > 0:
            if z_vals_outside.ndim == 1:
                z_vals_outside = jnp.broadcast_to(
                    z_vals_outside[None, :], (batch, self.n_outside)
                )
            z_vals_outside = far / jnp.flip(z_vals_outside, -1) + 1.0 / self.n_samples

        background_alpha = None
        background_sampled_color = None

        if self.n_importance > 0:
            pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
            sdf = jax.lax.stop_gradient(
                self.network.sdf_network.sdf(params["sdf"], pts.reshape(-1, 3))
            ).reshape(batch, self.n_samples)
            for i in range(self.up_sample_steps):
                new_z = self.up_sample(
                    params, rays_o, rays_d, z_vals, sdf,
                    self.n_importance // self.up_sample_steps, 64 * 2 ** i,
                )
                z_vals, sdf = self.cat_z_vals(
                    params, rays_o, rays_d, z_vals, new_z,
                    sdf, last=(i + 1 == self.up_sample_steps),
                )
            z_vals = jax.lax.stop_gradient(z_vals)

        n_total = self.n_samples + self.n_importance
        if self.n_outside > 0:
            z_feed = jnp.sort(
                jnp.concatenate([z_vals, z_vals_outside], -1), axis=-1
            )
            ret_out = self.render_core_outside(
                params, rays_o, rays_d, z_feed, sample_dist
            )
            background_sampled_color = ret_out["sampled_color"]
            background_alpha = ret_out["alpha"]

        ret = self.render_core(
            params, rays_o, rays_d, z_vals, sample_dist,
            background_alpha=background_alpha,
            background_sampled_color=background_sampled_color,
            background_rgb=background_rgb,
            cos_anneal_ratio=cos_anneal_ratio,
        )
        weights = ret["weights"]
        return {
            "color_fine": ret["color"],
            "s_val": jnp.mean(ret["s_val"]) * jnp.ones((batch, 1)),
            "cdf_fine": ret["cdf"],
            "weight_sum": jnp.sum(weights, -1, keepdims=True),
            "weight_max": jnp.max(weights, -1, keepdims=True),
            "sdf": ret["sdf"],
            "gradients": ret["gradients"],
            "alpha": ret["alpha"],
            "z_vals": z_vals,
            "weights": weights,
            "gradient_error": ret["gradient_error"],
            "inside_sphere": ret["inside_sphere"],
        }

    # ---------------------------------------------------------- geometry
    def extract_geometry(self, params, bound_min, bound_max, resolution,
                         threshold=0.0):
        from jnerf_tpu.ops.marching import extract_geometry

        return extract_geometry(
            bound_min, bound_max, resolution, threshold,
            lambda pts: -self.network.sdf_network.sdf(params["sdf"], pts)[:, 0],
        )
