"""Differentiable volume rendering over fixed [R, S] sample batches.

Reimplements `compute_rgbs` / `compute_rgbs_inference`
(`/root/reference/python/jnerf/models/samplers/density_grid_sampler/op_header/calc_rgb.h:11-74,151-212`)
as masked cumulative products; the hand-written backward
(`compute_rgbs_grad` :76-148, including its suffix-sum formulation) is
exactly what JAX autodiff derives from this forward, so no custom VJP is
needed — XLA fuses the whole thing into the surrounding step.

Activations are the reference defaults (`calc_rgb.py:21-22`):
rgb = logistic(sigmoid), density = exponential.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Saturation point of the exponential density activation.  The reference's
# `network_to_density` (`density_grid_sampler_header.h:290-302`) is an
# unclamped `__expf`, but its MLP emits fp16, whose 65504 max implicitly
# bounds the result; our MLPs emit bf16 (range ~3e38), and measured
# training grows raw density without bound in unsupervised regions
# (object interiors, pruned space: weight≈0 ⇒ no restoring gradient while
# the shared MLP weights keep growing) — raw crossed 88 ⇒ exp overflows
# f32 ⇒ the grid mean, the L1 regularizer, and then every parameter went
# NaN (round-4 ceiling run).  exp(15)≈3.3e6 saturates alpha at any dt the
# marcher produces (alpha=1 from sigma·dt≳20, dt≥1e-3 ⇒ sigma 2e4), so
# clamping is rendering-equivalent and makes overflow impossible.
RAW_DENSITY_CAP = 15.0


def network_to_density(raw):
    """Exponential density activation, saturated (TPU-native
    `network_to_density`, see RAW_DENSITY_CAP)."""
    return jnp.exp(jnp.minimum(raw, RAW_DENSITY_CAP))


def raw_to_alpha(raw_sigma, dts, valid):
    """sigma = exp(raw); alpha = 1 - exp(-sigma*dt), masked."""
    sigma = network_to_density(raw_sigma)
    return jnp.where(valid, 1.0 - jnp.exp(-sigma * dts), 0.0)


def render_rays(raw, dts, valid, truncated=None, background=None):
    """Composite network outputs to per-ray RGB.

    Args:
      raw: [R, S, 4] raw network outputs (rgb logits, log-sigma).
      dts: [R, S] step sizes (world units).
      valid: [R, S] bool sample mask.
      truncated: [R] bool; rays whose sample list was cut short skip the
        background term, like `calc_rgb.h:68-71` (compacted < total steps).
      background: [R, 3] or [3] background color; None skips it.
    Returns:
      rgb [R, 3], opacity [R] (= 1 - final transmittance).
    """
    rgb = jax.nn.sigmoid(raw[..., :3])
    alpha = raw_to_alpha(raw[..., 3], dts, valid)
    # Exclusive cumprod: T_i = prod_{j<i} (1 - alpha_j).
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    t_excl = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * t_excl  # [R, S]
    rgb_ray = jnp.sum(weights[..., None] * rgb, axis=-2)  # [R, 3]
    t_final = trans[..., -1]
    if background is not None:
        bg_weight = t_final
        if truncated is not None:
            bg_weight = jnp.where(truncated, 0.0, bg_weight)
        rgb_ray = rgb_ray + bg_weight[..., None] * background
    return rgb_ray, 1.0 - t_final


def density_l1_reg(raw_sigma, valid, grid_mean, coef, min_optical_thickness=0.01):
    """Early-training L1 push on negative raw densities.

    Mirrors `calc_rgb.h:112,141`: active only while the density-grid mean is
    below NERF_MIN_OPTICAL_THICKNESS; gradient is -coef for raw < 0.
    """
    active = (grid_mean < min_optical_thickness).astype(jnp.float32)
    return active * coef * jnp.sum(jnp.where(valid, jax.nn.relu(-raw_sigma), 0.0))
