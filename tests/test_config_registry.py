"""Config system + registry unit tests (SURVEY.md §4 layer (a))."""

import os
import textwrap

import pytest

from jnerf_tpu.utils.config import Config, get_cfg, init_cfg
from jnerf_tpu.utils.registry import Registry, build_from_cfg


def _write(path, body):
    with open(path, "w") as f:
        f.write(textwrap.dedent(body))


def test_py_config_loading(tmp_path):
    p = tmp_path / "cfg.py"
    _write(p, """
        lr = 0.1
        model = dict(type='Foo', width=64)
        steps = 1 << 10
    """)
    cfg = Config(str(p))
    assert cfg.lr == 0.1
    assert cfg.model.type == "Foo"
    assert cfg.model.width == 64
    assert cfg.steps == 1024
    assert cfg.missing_key is None  # attribute access on absent keys
    assert cfg.name == "cfg"


def test_base_inheritance_merge(tmp_path):
    _write(tmp_path / "base.py", """
        optim = dict(type='Adam', lr=0.01, betas=(0.9, 0.99))
        steps = 100
    """)
    _write(tmp_path / "child.py", """
        _base_ = 'base.py'
        optim = dict(lr=0.5)
        extra = True
    """)
    cfg = Config(str(tmp_path / "child.py"))
    assert cfg.optim.lr == 0.5
    assert cfg.optim.type == "Adam"  # merged, not replaced
    assert cfg.steps == 100
    assert cfg.extra is True


def test_cover_key_replaces(tmp_path):
    _write(tmp_path / "base.py", """
        optim = dict(type='Adam', lr=0.01, eps=1e-15)
    """)
    _write(tmp_path / "child.py", """
        _base_ = 'base.py'
        optim = dict(_cover_=True, type='SGD', lr=0.5)
    """)
    cfg = Config(str(tmp_path / "child.py"))
    assert cfg.optim.type == "SGD"
    assert "eps" not in cfg.optim  # _cover_ replaced the whole dict
    assert "_cover_" not in cfg.optim


def test_multi_base_list(tmp_path):
    _write(tmp_path / "a.py", "x = 1\ny = 1")
    _write(tmp_path / "b.py", "y = 2\nz = 2")
    _write(tmp_path / "child.py", "_base_ = ['a.py', 'b.py']\nz = 3")
    cfg = Config(str(tmp_path / "child.py"))
    assert (cfg.x, cfg.y, cfg.z) == (1, 2, 3)


def test_global_singleton(tmp_path, fresh_cfg):
    _write(tmp_path / "cfg.py", "value = 7")
    init_cfg(str(tmp_path / "cfg.py"))
    assert get_cfg().value == 7


def test_registry_build():
    REG = Registry("TEST")

    @REG.register_module()
    class Thing:
        def __init__(self, a, b=2):
            self.a, self.b = a, b

    obj = build_from_cfg(dict(type="Thing", a=1), REG)
    assert (obj.a, obj.b) == (1, 2)
    obj2 = build_from_cfg(dict(type="Thing", a=1), REG, b=5)
    assert obj2.b == 5
    with pytest.raises(KeyError):
        REG.get("Missing")
    assert build_from_cfg(None, REG) is None


def test_builtin_registries_populated():
    import jnerf_tpu  # noqa: F401
    from jnerf_tpu.utils.registry import DATASETS, ENCODERS, NETWORKS, OPTIMS, SAMPLERS, LOSSES

    assert "NerfDataset" in DATASETS
    assert {"HashEncoder", "SHEncoder", "FrequencyEncoder"} <= set(ENCODERS.keys())
    assert {"NGPNetworks", "OriginNeRFNetworks"} <= set(NETWORKS.keys())
    assert "DensityGridSampler" in SAMPLERS
    assert {"Adam", "EMA", "ExpDecay"} <= set(OPTIMS.keys())
    assert {"HuberLoss", "MSELoss"} <= set(LOSSES.keys())


def test_reference_config_keys_load(fresh_cfg):
    """Our shipped ngp_base must expose the reference's key surface."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    init_cfg(os.path.join(here, "projects", "ngp", "configs", "ngp_base.py"))
    cfg = get_cfg()
    for key in [
        "sampler", "encoder", "model", "loss", "optim", "ema", "expdecay",
        "dataset", "exp_name", "log_dir", "tot_train_steps", "background_color",
        "hash_func", "cone_angle_constant", "near_distance", "n_rays_per_batch",
        "n_training_steps", "target_batch_size", "const_dt", "load_ckpt",
        "ckpt_path", "alpha_image",
    ]:
        assert key in cfg, key
    assert cfg.target_batch_size == 1 << 18
