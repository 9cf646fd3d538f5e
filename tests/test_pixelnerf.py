"""pixelNeRF: component shapes + a short training-improves-loss check."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.models.networks.pixelnerf import (
    ImageEncoder,
    PixelNeRF,
    bilinear_sample,
    positional_encoding,
    render_rays_pixelnerf,
)


class TestComponents:
    def test_positional_encoding_shape(self):
        x = jnp.zeros((4, 8, 3))
        out = positional_encoding(x, 6)
        assert out.shape == (4, 8, 3 + 36)

    def test_encoder_output(self):
        enc = ImageEncoder()
        params = enc.init(jax.random.PRNGKey(0))
        feats = enc(params, jnp.zeros((2, 64, 64, 3)))
        assert feats.shape == (2, 32, 32, 512)

    def test_bilinear_sample_exact_at_centers(self):
        feat = jnp.asarray(np.random.default_rng(0).normal(size=(8, 8, 4)),
                           jnp.float32)
        uv = jnp.asarray([[2.0, 3.0], [5.0, 1.0]])
        out = np.asarray(bilinear_sample(feat, uv))
        np.testing.assert_allclose(out[0], np.asarray(feat[3, 2]), rtol=1e-5)
        np.testing.assert_allclose(out[1], np.asarray(feat[1, 5]), rtol=1e-5)

    def test_network_and_render(self):
        net = PixelNeRF(img_f_ch=16)
        params = net.init(jax.random.PRNGKey(1))
        R, S, n_ref = 8, 16, 3
        feats = jnp.zeros((n_ref, R, S, 16))
        rays_o = jnp.zeros((R, 3))
        rays_d = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (R, 1)))
        rgb, depth, acc = render_rays_pixelnerf(
            net, params, rays_o, rays_d, (2.0, 6.0), S,
            lambda pts: feats, key=jax.random.PRNGKey(2),
        )
        assert rgb.shape == (R, 3)
        assert bool(jnp.isfinite(rgb).all())
        assert float(acc.min()) >= 0 and float(acc.max()) <= 1 + 1e-5


@pytest.mark.slow
def test_main_script_trains(tmp_path):
    """Run the mini-project end to end for 2 epochs on the analytic scene."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(here, "projects", "pixelnerf", "main.py"),
         "--synthetic", "--epochs", "2", "--batch", "256",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("epoch")]
    assert len(lines) == 2
    l0 = float(lines[0].split("loss=")[1])
    l1 = float(lines[1].split("loss=")[1])
    assert l1 < l0, (l0, l1)
    assert os.path.exists(tmp_path / "pixelnerf.pkl")
