"""NeuS tests: geometric init, renderer math, marching tets, e2e smoke."""

import os
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def neus_scene(tmp_path_factory):
    from jnerf_tpu.dataset.synthetic import make_synthetic_neus_scene

    root = tmp_path_factory.mktemp("neus_scene")
    return make_synthetic_neus_scene(str(root / "scan"), n_images=10, H=72, W=72)


def _write_neus_cfg(path, scene_dir, exp_dir, end_iter=200):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = os.path.join(here, "projects", "neus", "configs", "neus_womask.py")
    path.write_text(textwrap.dedent(f"""
        _base_ = {base!r}
        dataset = dict(dataset_dir={scene_dir!r})
        base_exp_dir = {exp_dir!r}
        end_iter = {end_iter}
        batch_size = 128
        warm_up_end = 50
        anneal_end = 100
        val_freq = 100000
        val_mesh_freq = 100000
        save_freq = 100000
        report_freq = 100
        validate_resolution_level = 8
        render = dict(n_samples=32, n_importance=32, n_outside=8,
                      up_sample_steps=2, perturb=1.0, _cover_=True,
                      type='NeuSRenderer')
        seed = 0
    """))


class TestMarchingTets:
    def test_sphere_surface(self):
        from jnerf_tpu.ops.marching import extract_geometry

        # field = 0.4 - |p| -> zero level at radius 0.4 (positive inside,
        # matching -sdf conventions).
        verts, tris = extract_geometry(
            [-0.6, -0.6, -0.6], [0.6, 0.6, 0.6], 48, 0.0,
            lambda p: 0.4 - jnp.linalg.norm(p, axis=-1),
        )
        assert len(verts) > 100 and len(tris) > 100
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r.mean(), 0.4, atol=0.02)
        assert r.std() < 0.02

    def test_ply_roundtrip_header(self, tmp_path):
        from jnerf_tpu.ops.marching import marching_tetrahedra, write_ply

        field = np.zeros((8, 8, 8), np.float32)
        field[2:6, 2:6, 2:6] = 1.0
        v, t = marching_tetrahedra(field, 0.5)
        p = write_ply(str(tmp_path / "m.ply"), v, t)
        with open(p, "rb") as f:
            head = f.read(200)
        assert head.startswith(b"ply\nformat binary_little_endian")
        assert f"element vertex {len(v)}".encode() in head

    def test_largest_component(self):
        from jnerf_tpu.ops.marching import largest_component, marching_tetrahedra

        field = np.zeros((16, 16, 16), np.float32)
        field[2:10, 2:10, 2:10] = 1.0  # big blob
        field[12:14, 12:14, 12:14] = 1.0  # small blob
        v, t = marching_tetrahedra(field, 0.5)
        v2, t2 = largest_component(v, t)
        assert len(t2) < len(t)
        assert v2[:, 0].max() < 11  # the small blob is gone


class TestNeuSNetworks:
    def test_sdf_geometric_init_is_spherical(self, fresh_cfg, neus_scene):
        from jnerf_tpu.utils.config import get_cfg
        cfg = get_cfg()
        cfg.encoder = {
            "sdf_encoder": {"type": "FrequencyEncoder", "multires": 6,
                            "input_dims": 3},
        }
        cfg.encoder = type(cfg)._wrap(cfg.encoder)
        from jnerf_tpu.models.networks.neus_network import SDFNetwork

        net = SDFNetwork(d_out=257, d_hidden=256, n_layers=8, bias=0.5)
        params = net.init(jax.random.PRNGKey(0))
        pts = jnp.asarray(
            np.random.default_rng(0).uniform(-1, 1, (64, 3)), jnp.float32
        )
        sdf = np.asarray(net.sdf(params, pts))[:, 0]
        r = np.linalg.norm(np.asarray(pts), axis=-1)
        # Geometric init approximates sdf ~ |x| - bias.
        corr = np.corrcoef(sdf, r - 0.5)[0, 1]
        assert corr > 0.9, corr
        g = np.asarray(net.gradient(params, pts))
        norms = np.linalg.norm(g, axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=0.35)


@pytest.mark.slow
class TestNeuSEndToEnd:
    def test_trains_and_extracts_mesh(self, tmp_path, neus_scene, fresh_cfg):
        from jnerf_tpu.utils.config import init_cfg
        from jnerf_tpu.runner.neus_runner import NeuSRunner

        cfg_file = tmp_path / "neus_smoke.py"
        _write_neus_cfg(cfg_file, neus_scene, str(tmp_path / "exp"), end_iter=150)
        init_cfg(str(cfg_file))
        runner = NeuSRunner()

        # Initial geometric-init sphere mesh exists.
        mesh0 = runner.validate_mesh(resolution=48)
        assert os.path.getsize(mesh0) > 1000

        data = runner.dataset.gen_random_rays_at(0, 128)
        rays_o, rays_d = data[:, :3], data[:, 3:6]
        near, far = runner.dataset.near_far_from_sphere(rays_o, rays_d)
        out = runner.renderer.render(
            runner.params, rays_o, rays_d, near, far,
            key=jax.random.PRNGKey(0), cos_anneal_ratio=0.5,
        )
        assert out["color_fine"].shape == (128, 3)
        assert bool(jnp.isfinite(out["color_fine"]).all())
        assert bool(jnp.isfinite(out["gradient_error"]))

        runner.train()
        assert runner.iter_step == 150
        img = runner.validate_image(idx=0)
        assert img.shape[2] == 3
        ckpts = os.listdir(os.path.join(runner.base_exp_dir, "checkpoints")) \
            if os.path.isdir(os.path.join(runner.base_exp_dir, "checkpoints")) else []
        runner.save_checkpoint()
        runner2 = NeuSRunner(is_continue=True)
        assert runner2.iter_step == 150
