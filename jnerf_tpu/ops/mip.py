"""Mip-NeRF math: cone casting, integrated positional encoding, resampling.

Parity target: `/root/reference/contrib/mipnerf/python/jnerf/dataset/miputils.py`
(`conical_frustum_to_gaussian` :159-190, `lift_gaussian`, `cast_rays`
:215-239, `integrated_pos_enc` :242-275, `expected_sin` :130-135,
`volumetric_rendering` :278-321, `sorted_piecewise_constant_pdf` :61-117,
`resample_along_rays` :365-408, `convert_to_ndc` :411-431).  The reference
is itself a Jittor port of Google's JAX mip-NeRF, so this is the math coming
home: everything is expressed directly in jnp and jits end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pos_enc(x, min_deg, max_deg, append_identity=True):
    """Classic positional encoding over degrees [min_deg, max_deg)."""
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    xb = (x[..., None, :] * scales[:, None]).reshape(*x.shape[:-1], -1)
    four_feat = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
    if append_identity:
        return jnp.concatenate([x, four_feat], axis=-1)
    return four_feat


def expected_sin(x, x_var):
    """E[sin(z)], Var[sin(z)] for z ~ N(x, x_var)."""
    y = jnp.exp(-0.5 * x_var) * jnp.sin(x)
    y_var = 0.5 * (1.0 - jnp.exp(-2.0 * x_var) * jnp.cos(2.0 * x)) - y ** 2
    return y, jnp.maximum(0.0, y_var)


def lift_gaussian(d, t_mean, t_var, r_var, diag=True):
    """1-D ray Gaussian -> 3-D world Gaussian (diagonal covariance)."""
    mean = d[..., None, :] * t_mean[..., None]
    d_mag_sq = jnp.maximum(1e-10, jnp.sum(d ** 2, axis=-1, keepdims=True))
    assert diag
    d_outer_diag = d ** 2
    null_outer_diag = 1.0 - d_outer_diag / d_mag_sq
    t_cov_diag = t_var[..., None] * d_outer_diag[..., None, :]
    xy_cov_diag = r_var[..., None] * null_outer_diag[..., None, :]
    return mean, t_cov_diag + xy_cov_diag


def conical_frustum_to_gaussian(d, t0, t1, base_radius, diag=True, stable=True):
    """Moments of a conical frustum along ray d over [t0, t1]."""
    if stable:
        mu = (t0 + t1) / 2.0
        hw = (t1 - t0) / 2.0
        common = 3.0 * mu ** 2 + hw ** 2
        t_mean = mu + (2.0 * mu * hw ** 2) / common
        t_var = hw ** 2 / 3.0 - (4.0 / 15.0) * (
            (hw ** 4 * (12.0 * mu ** 2 - hw ** 2)) / common ** 2
        )
        r_var = base_radius ** 2 * (
            mu ** 2 / 4.0 + (5.0 / 12.0) * hw ** 2 - (4.0 / 15.0) * hw ** 4 / common
        )
    else:
        t_mean = (3.0 * (t1 ** 4 - t0 ** 4)) / (4.0 * (t1 ** 3 - t0 ** 3))
        r_var = base_radius ** 2 * (
            3.0 / 20.0 * (t1 ** 5 - t0 ** 5) / (t1 ** 3 - t0 ** 3)
        )
        t_mosq = 3.0 / 5.0 * (t1 ** 5 - t0 ** 5) / (t1 ** 3 - t0 ** 3)
        t_var = t_mosq - t_mean ** 2
    return t_mean, t_var, r_var


def cylinder_to_gaussian(d, t0, t1, radius, diag=True):
    t_mean = (t0 + t1) / 2.0
    r_var = radius ** 2 / 4.0
    t_var = (t1 - t0) ** 2 / 12.0
    return t_mean, t_var, r_var


def cast_rays(t_vals, origins, directions, radii, ray_shape="cone", diag=True):
    """Bin edges [R, S+1] -> per-bin Gaussians (means [R, S, 3], covs)."""
    t0 = t_vals[..., :-1]
    t1 = t_vals[..., 1:]
    if ray_shape == "cone":
        t_mean, t_var, r_var = conical_frustum_to_gaussian(
            directions, t0, t1, radii, diag
        )
    elif ray_shape == "cylinder":
        t_mean, t_var, r_var = cylinder_to_gaussian(directions, t0, t1, radii, diag)
    else:
        raise ValueError(ray_shape)
    means, covs = lift_gaussian(directions, t_mean, t_var, r_var, diag)
    return means + origins[..., None, :], covs


def integrated_pos_enc(x_coord, min_deg, max_deg, diag=True):
    """IPE of Gaussians: sin/cos features attenuated by their variance."""
    x, x_cov_diag = x_coord
    scales = 2.0 ** jnp.arange(min_deg, max_deg)
    shape = x.shape[:-1] + (-1,)
    y = (x[..., None, :] * scales[:, None]).reshape(shape)
    y_var = (x_cov_diag[..., None, :] * scales[:, None] ** 2).reshape(shape)
    return expected_sin(
        jnp.concatenate([y, y + 0.5 * jnp.pi], axis=-1),
        jnp.concatenate([y_var, y_var], axis=-1),
    )[0]


def volumetric_rendering(rgb, density, t_vals, dirs, white_bkgd=False):
    """Composite per-bin rgb/density to per-ray outputs.

    Returns (comp_rgb [R,3], distance [R], acc [R], weights [R,S]).
    """
    t_mids = 0.5 * (t_vals[..., :-1] + t_vals[..., 1:])
    t_dists = t_vals[..., 1:] - t_vals[..., :-1]
    delta = t_dists * jnp.linalg.norm(dirs[..., None, :], axis=-1)
    density_delta = density[..., 0] * delta
    alpha = 1.0 - jnp.exp(-density_delta)
    trans = jnp.exp(
        -jnp.concatenate(
            [jnp.zeros_like(density_delta[..., :1]),
             jnp.cumsum(density_delta[..., :-1], axis=-1)], axis=-1,
        )
    )
    weights = alpha * trans
    comp_rgb = jnp.sum(weights[..., None] * rgb, axis=-2)
    acc = jnp.sum(weights, axis=-1)
    distance = jnp.clip(
        jnp.nan_to_num(
            jnp.sum(weights * t_mids, axis=-1) / jnp.maximum(acc, 1e-10),
            nan=jnp.inf,
        ),
        t_vals[..., 0], t_vals[..., -1],
    )
    if white_bkgd:
        comp_rgb = comp_rgb + (1.0 - acc[..., None])
    return comp_rgb, distance, acc, weights


def sample_along_rays(key, origins, directions, radii, num_samples, near, far,
                      randomized, lindisp, ray_shape="cone"):
    """Stratified initial bins + cast to Gaussians."""
    batch = origins.shape[0]
    t_vals = jnp.linspace(0.0, 1.0, num_samples + 1)
    if lindisp:
        t_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        t_vals = near * (1.0 - t_vals) + far * t_vals
    if randomized:
        mids = 0.5 * (t_vals[..., 1:] + t_vals[..., :-1])
        upper = jnp.concatenate([mids, t_vals[..., -1:]], -1)
        lower = jnp.concatenate([t_vals[..., :1], mids], -1)
        u = jax.random.uniform(key, (batch, num_samples + 1))
        t_vals = lower + (upper - lower) * u
    else:
        t_vals = jnp.broadcast_to(t_vals, (batch, num_samples + 1))
    means, covs = cast_rays(t_vals, origins, directions, radii, ray_shape)
    return t_vals, (means, covs)


def sorted_piecewise_constant_pdf(key, bins, weights, num_samples, randomized):
    """Inverse-CDF sampling over sorted bins (`miputils.py:61-117`)."""
    eps = 1e-5
    weight_sum = jnp.sum(weights, axis=-1, keepdims=True)
    padding = jnp.maximum(0.0, eps - weight_sum)
    weights = weights + padding / weights.shape[-1]
    weight_sum = weight_sum + padding

    pdf = weights / weight_sum
    cdf = jnp.minimum(1.0, jnp.cumsum(pdf[..., :-1], axis=-1))
    cdf = jnp.concatenate(
        [jnp.zeros_like(cdf[..., :1]), cdf, jnp.ones_like(cdf[..., :1])], -1
    )

    if randomized:
        s = 1.0 / num_samples
        u = jnp.arange(num_samples) * s
        u = u + jax.random.uniform(
            key, cdf.shape[:-1] + (num_samples,), maxval=s - jnp.finfo("float32").eps
        )
        u = jnp.minimum(u, 1.0 - jnp.finfo("float32").eps)
    else:
        u = jnp.linspace(0.0, 1.0 - jnp.finfo("float32").eps, num_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (num_samples,))

    mask = u[..., None, :] >= cdf[..., :, None]  # [R, B+1, S]

    def pick(x, fill_lo, fill_hi):
        x0 = jnp.max(jnp.where(mask, x[..., None], x[..., :1, None]), axis=-2)
        x1 = jnp.min(jnp.where(~mask, x[..., None], x[..., -1:, None]), axis=-2)
        return x0, x1

    bins_g0, bins_g1 = pick(bins, None, None)
    cdf_g0, cdf_g1 = pick(cdf, None, None)

    t = jnp.clip(
        jnp.nan_to_num((u - cdf_g0) / (cdf_g1 - cdf_g0), nan=0.0), 0.0, 1.0
    )
    return bins_g0 + t * (bins_g1 - bins_g0)


def resample_along_rays(key, origins, directions, radii, t_vals, weights,
                        randomized, stop_grad, resample_padding,
                        ray_shape="cone"):
    """Blurpooled resampling for the fine level (`miputils.py:365-408`)."""
    w_pad = jnp.concatenate([weights[..., :1], weights, weights[..., -1:]], -1)
    w_max = jnp.maximum(w_pad[..., :-1], w_pad[..., 1:])
    w_blur = 0.5 * (w_max[..., :-1] + w_max[..., 1:])
    weights = w_blur + resample_padding

    new_t = sorted_piecewise_constant_pdf(
        key, t_vals, weights, t_vals.shape[-1], randomized
    )
    if stop_grad:
        new_t = jax.lax.stop_gradient(new_t)
    means, covs = cast_rays(new_t, origins, directions, radii, ray_shape)
    return new_t, (means, covs)


def convert_to_ndc(origins, directions, focal, w, h, near=1.0):
    """Shift rays into NDC space (forward-facing captures)."""
    t = -(near + origins[..., 2]) / directions[..., 2]
    origins = origins + t[..., None] * directions
    dx, dy, dz = directions[..., 0], directions[..., 1], directions[..., 2]
    ox, oy, oz = origins[..., 0], origins[..., 1], origins[..., 2]
    o0 = -((2 * focal) / w) * (ox / oz)
    o1 = -((2 * focal) / h) * (oy / oz)
    o2 = 1 + 2 * near / oz
    d0 = -((2 * focal) / w) * (dx / dz - ox / oz)
    d1 = -((2 * focal) / h) * (dy / dz - oy / oz)
    d2 = -2 * near / oz
    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
