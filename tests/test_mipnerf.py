"""Mip-NeRF tests: IPE/frustum math, resampling, e2e smoke training."""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.ops.mip import (
    cast_rays,
    conical_frustum_to_gaussian,
    expected_sin,
    integrated_pos_enc,
    pos_enc,
    sorted_piecewise_constant_pdf,
    volumetric_rendering,
)


class TestMipMath:
    def test_expected_sin_zero_var_is_sin(self):
        x = jnp.linspace(-3, 3, 32)
        y, y_var = expected_sin(x, jnp.zeros_like(x))
        np.testing.assert_allclose(np.asarray(y), np.sin(np.asarray(x)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_var), 0.0, atol=1e-6)

    def test_expected_sin_large_var_vanishes(self):
        x = jnp.linspace(-3, 3, 32)
        y, _ = expected_sin(x, jnp.full_like(x, 100.0))
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)

    def test_conical_frustum_moments_match_monte_carlo(self):
        """Check t_mean/t_var against Monte-Carlo integration of a cone."""
        rng = np.random.default_rng(0)
        t0, t1, r = 0.9, 1.1, 0.05
        # Sample uniformly in the frustum volume: p(t) ~ t^2.
        u = rng.uniform(size=2_000_00)
        ts = (t0 ** 3 + u * (t1 ** 3 - t0 ** 3)) ** (1 / 3)
        d = jnp.asarray([0.0, 0.0, 1.0])
        t_mean, t_var, r_var = conical_frustum_to_gaussian(
            d, jnp.asarray(t0), jnp.asarray(t1), r
        )
        np.testing.assert_allclose(float(t_mean), ts.mean(), rtol=1e-3)
        np.testing.assert_allclose(float(t_var), ts.var(), rtol=0.05)

    def test_ipe_reduces_to_pe_at_zero_cov(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)), jnp.float32)
        ipe = integrated_pos_enc((x, jnp.zeros_like(x)), 0, 4)
        pe = pos_enc(x, 0, 4, append_identity=False)
        np.testing.assert_allclose(np.asarray(ipe), np.asarray(pe), atol=1e-5)

    def test_cast_rays_shapes(self):
        R, S = 8, 16
        t_vals = jnp.broadcast_to(jnp.linspace(2.0, 6.0, S + 1), (R, S + 1))
        o = jnp.zeros((R, 3))
        d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (R, 1)))
        radii = jnp.full((R, 1), 0.001)
        means, covs = cast_rays(t_vals, o, d, radii)
        assert means.shape == (R, S, 3)
        assert covs.shape == (R, S, 3)
        z = np.asarray(means[..., 2])
        assert (np.diff(z, axis=-1) > 0).all()

    def test_volumetric_rendering_opaque_wall(self):
        R, S = 4, 32
        t_vals = jnp.broadcast_to(jnp.linspace(0.0, 2.0, S + 1), (R, S + 1))
        rgb = jnp.ones((R, S, 3)) * jnp.asarray([1.0, 0.5, 0.25])
        density = jnp.full((R, S, 1), 1e4)  # opaque from the first bin
        dirs = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (R, 1)))
        comp, dist, acc, weights = volumetric_rendering(rgb, density, t_vals, dirs)
        np.testing.assert_allclose(np.asarray(comp[:, 0]), 1.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(acc), 1.0, atol=1e-4)

    def test_pdf_sampling_concentrates(self):
        R, B, S = 2, 32, 64
        bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, B + 1), (R, B + 1))
        w = np.full((R, B), 1e-4, np.float32)
        w[:, 20] = 10.0  # mass at bin [20/32, 21/32)
        samples = sorted_piecewise_constant_pdf(
            jax.random.PRNGKey(0), bins, jnp.asarray(w), S, randomized=True
        )
        frac = ((np.asarray(samples) >= 20 / 32) & (np.asarray(samples) <= 21 / 32)).mean()
        assert frac > 0.9, frac


@pytest.mark.slow
class TestMipEndToEnd:
    def test_smoke_train(self, tmp_path, synthetic_scene, fresh_cfg):
        from jnerf_tpu.utils.config import init_cfg
        from jnerf_tpu.runner.mip_runner import MipRunner

        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        base = os.path.join(here, "projects", "mipnerf", "configs", "mip_base.py")
        cfg_file = tmp_path / "mip_smoke.py"
        cfg_file.write_text(textwrap.dedent(f"""
            _base_ = {base!r}
            exp_name = "mip_smoke"
            log_dir = {str(tmp_path / 'logs')!r}
            dataset_dir = {synthetic_scene!r}
            dataset = dict(
                train=dict(root_dir=dataset_dir, batch_size=256),
                val=dict(root_dir=dataset_dir, batch_size=256),
                test=dict(root_dir=dataset_dir, batch_size=256),
            )
            tot_train_steps = 60
            num_samples = 32
            net_depth = 4
            net_width = 64
            net_width_condition = 32
            linearlog = dict(max_steps=60, lr_delay_steps=10)
            near = 2.0
            far = 6.0
            seed = 0
        """))
        init_cfg(str(cfg_file))
        runner = MipRunner()
        runner.chunk = 1024

        rays, rgb = next(runner.dataset["train"])
        assert rays.origins.shape == (256, 3)
        losses = []
        runner._train_jit = runner._build_train_step()
        for i in range(60):
            rays, rgb_target = next(runner.dataset["train"])
            runner.key, k = jax.random.split(runner.key)
            runner.params, runner.opt_state, loss, _ = runner._train_jit(
                runner.params, runner.opt_state, rays, rgb_target, k
            )
            losses.append(float(loss))
        assert np.mean(losses[-10:]) < np.mean(losses[:3]) * 0.7, (
            losses[:5], losses[-5:],
        )
        img = runner.render_image(runner.dataset["val"], 0)
        assert img.shape == (64, 64, 3)
        assert np.isfinite(img).all()
