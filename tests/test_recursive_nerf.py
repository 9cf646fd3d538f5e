"""Recursive-NeRF: tree topology, routing, staged training."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jnerf_tpu.models.networks.recursive_nerf import (
    RecursiveNeRF,
    kmeans,
    split_anchors,
)


class TestTree:
    def test_topologies(self):
        for heads, nodes in [(1, 4), (4, 11), (8, 15)]:
            m = RecursiveNeRF(head_num=heads, W=32)
            assert m.node_num == nodes
            leaves = sum(1 for s in m.sons if not s)
            assert leaves == heads

    def test_forward_levels(self):
        m = RecursiveNeRF(head_num=4, W=32)
        params = m.init(jax.random.PRNGKey(0))
        pts = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (64, 3)),
                          jnp.float32)
        views = jnp.asarray(np.tile([[0.0, 0.0, 1.0]], (64, 1)))
        out0, u0 = m(params, pts, views, max_level=0)
        out_full, _ = m(params, pts, views)
        assert out0.shape == (64, 4)
        assert bool(jnp.isfinite(out0).all() and jnp.isfinite(out_full).all())

    def test_gradients_reach_all_heads(self):
        m = RecursiveNeRF(head_num=1, W=32, threshold=-1.0)  # always recurse
        params = m.init(jax.random.PRNGKey(1))
        pts = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (32, 3)),
                          jnp.float32)
        views = jnp.ones((32, 3))

        g = jax.grad(lambda p: jnp.sum(m(p, pts, views)[0] ** 2))(params)
        # deepest node's output head must receive gradient
        assert float(jnp.abs(g["rgb"][-1]["view"]["w"]).sum()) > 0

    def test_kmeans_and_split(self):
        pts = np.concatenate([
            np.random.default_rng(0).normal(loc=-2, size=(100, 3)),
            np.random.default_rng(1).normal(loc=2, size=(100, 3)),
        ]).astype(np.float32)
        c = kmeans(pts, 2, seed=0)
        assert abs(c[:, 0].min() + 2) < 1.0 and abs(c[:, 0].max() - 2) < 1.0

        m = RecursiveNeRF(head_num=4, W=32)
        params = m.init(jax.random.PRNGKey(2))
        u = np.ones(len(pts), np.float32)
        p2 = split_anchors(m, params, pts, u)
        assert p2["anchors"][0].shape[0] == len(m.sons[0])
        assert float(jnp.abs(p2["anchors"][0]).sum()) > 0


@pytest.mark.slow
def test_main_script_stages(tmp_path):
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable,
         os.path.join(here, "projects", "recursive_nerf", "main.py"),
         "--synthetic", "--n-iters", "200", "--step1", "50", "--step2", "100",
         "--step3", "150", "--n-rand", "256", "--width", "64",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "stage -> level 1" in out.stdout
    assert os.path.exists(tmp_path / "recursive_nerf.pkl")
    first = float(out.stdout.split("mse=")[1].split()[0])
    last = float(out.stdout.rsplit("mse=", 1)[1].split()[0])
    assert last < first
