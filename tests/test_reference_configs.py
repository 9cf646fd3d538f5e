"""The REFERENCE's own config files must load through our config system —
the strongest proof of config-surface parity (read-only access to the
mounted reference; we never import its package code)."""

import os

import pytest

from jnerf_tpu.utils.config import Config

REF = "/root/reference/projects"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference mount not present"
)


def test_reference_ngp_base_loads():
    cfg = Config(os.path.join(REF, "ngp/configs/ngp_base.py"))
    assert cfg.sampler.type == "DensityGridSampler"
    assert cfg.encoder.pos_encoder.type == "HashEncoder"
    assert cfg.model.type == "NGPNetworks"
    assert cfg.optim.lr == 1e-1 and cfg.optim.eps == 1e-15
    assert cfg.target_batch_size == 1 << 18
    assert cfg.hash_func == "p0 ^ p1 * 19349663 ^ p2 * 83492791"
    assert cfg.dataset.train.batch_size == 4096


def test_reference_ngp_fox_loads():
    cfg = Config(os.path.join(REF, "ngp/configs/ngp_fox.py"))
    assert cfg.const_dt is False
    assert cfg.fp16 is True
    assert cfg.exp_name == "fox"


def test_reference_nerf_base_loads():
    cfg = Config(os.path.join(REF, "nerf/configs/nerf_base.py"))
    assert cfg.model.type == "OriginNeRFNetworks"
    assert cfg.encoder.pos_encoder.multires == 10
    assert cfg.tot_train_steps == 200000


def test_reference_neus_configs_load():
    cfg = Config(os.path.join(REF, "neus/configs/neus_womask.py"))
    assert cfg.model.type == "NeuS"
    assert cfg.render.type == "NeuSRenderer"
    assert cfg.render.n_outside == 32
    assert cfg.igr_weight == 0.1 and cfg.mask_weight == 0.0
    assert cfg.model.sdf_network.d_out == 257


def test_reference_registry_names_all_registered():
    """Every `type=` name used by the reference's shipped configs resolves
    in our registries."""
    import jnerf_tpu  # noqa: F401
    from jnerf_tpu.utils.registry import (
        DATASETS, ENCODERS, LOSSES, NETWORKS, OPTIMS, SAMPLERS,
    )

    registries = {
        "DensityGridSampler": SAMPLERS, "NeuSRenderer": SAMPLERS,
        "HashEncoder": ENCODERS, "SHEncoder": ENCODERS,
        "FrequencyEncoder": ENCODERS,
        "NGPNetworks": NETWORKS, "OriginNeRFNetworks": NETWORKS,
        "NeuS": NETWORKS,
        "HuberLoss": LOSSES, "MSELoss": LOSSES,
        "Adam": OPTIMS, "EMA": OPTIMS, "ExpDecay": OPTIMS,
        "NerfDataset": DATASETS, "LLFFDataset": DATASETS,
        "NeuSDataset": DATASETS,
    }
    for name, reg in registries.items():
        assert name in reg, name
