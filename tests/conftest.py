"""Test config: force CPU with 8 virtual devices (multi-chip sharding tests
run on a virtual mesh; no TPU required).

NOTE: this environment's sitecustomize registers a remote 'axon' TPU backend
and overrides jax_platforms AFTER env vars are read, so we must both set the
env var (for subprocesses) and call jax.config.update (for this process)
BEFORE any backend initialization.  Touching the axon backend from tests
would serialize on the single remote TPU claim and hang for minutes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def synthetic_scene(tmp_path_factory):
    """A small procedural blender-format scene shared across tests."""
    from jnerf_tpu.dataset.synthetic import make_synthetic_scene

    root = tmp_path_factory.mktemp("scene")
    return make_synthetic_scene(
        str(root / "spheres"), n_train=12, n_val=2, n_test=2, H=64, W=64
    )


@pytest.fixture()
def fresh_cfg():
    """Reset the global config singleton around a test."""
    from jnerf_tpu.utils.config import get_cfg

    cfg = get_cfg()
    saved = dict(cfg)
    cfg.clear()
    yield cfg
    cfg.clear()
    cfg.update(saved)


def rand_dirs(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)
