"""CLI entry point.

Parity target: `/root/reference/tools/run_net.py` — same flags
(``--config-file``, ``--task {train,test,render,validate_mesh}``,
``--type {novel_view,mesh}``, ``--mcube_threshold``).  The sm-arch guard is
replaced by a JAX backend report.

Unlike the reference, whose contrib projects fork their own run_net.py
(`/root/reference/contrib/mipnerf/tools/run_net.py`,
`/root/reference/contrib/plenoxel/tools/run_net.py`), every runner is
reachable from this one entry point: an explicit ``runner`` config key (or
``--runner`` flag) wins, otherwise the runner is inferred from the config's
sampler/model types.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from jnerf_tpu.utils.config import init_cfg


def select_runner_name(cfg, type_arg: str) -> str:
    """Explicit ``runner`` config key wins; otherwise infer from the config."""
    if cfg.runner:
        return str(cfg.runner)
    if type_arg == "mesh":
        return "NeuSRunner"
    sampler_type = (cfg.sampler or {}).get("type", "")
    model_type = (cfg.model or {}).get("type", "")
    if sampler_type == "MipSampler":
        return "MipRunner"
    if model_type == "SparseGrid":
        return "Svox2Runner"
    return "Runner"


def build_runner(name: str, task: str):
    if name == "NeuSRunner":
        from jnerf_tpu.runner.neus_runner import NeuSRunner

        return NeuSRunner(is_continue=(task == "validate_mesh"))
    if name == "MipRunner":
        from jnerf_tpu.runner.mip_runner import MipRunner

        return MipRunner()
    if name == "Svox2Runner":
        from jnerf_tpu.runner.svox2_runner import Svox2Runner

        return Svox2Runner()
    if name == "Runner":
        from jnerf_tpu.runner import Runner

        return Runner()
    raise SystemExit(f"unknown runner {name!r} (config key 'runner')")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config-file", default="", metavar="FILE",
                        help="path to config file")
    parser.add_argument("--task", default="train", type=str,
                        choices=["train", "test", "render", "validate_mesh"])
    parser.add_argument("--save_dir", default="", type=str)
    parser.add_argument("--type", default="novel_view", type=str,
                        choices=["novel_view", "mesh"])
    parser.add_argument("--mcube_threshold", default=0.0, type=float)
    parser.add_argument("--runner", default="", type=str,
                        help="override runner class (Runner, NeuSRunner, "
                             "MipRunner, Svox2Runner)")
    args = parser.parse_args()

    print("jax backend:", jax.default_backend(), jax.devices())
    assert args.config_file, "--config-file is required"
    init_cfg(args.config_file)
    from jnerf_tpu.utils.config import get_cfg

    name = args.runner or select_runner_name(get_cfg(), args.type)
    runner = build_runner(name, args.task)

    if args.task == "train":
        runner.train()
    elif args.task == "test":
        if not hasattr(runner, "test"):
            raise SystemExit(f"{name} does not implement task 'test'")
        runner.test(load_ckpt=True)
    elif args.task == "render":
        if not hasattr(runner, "render"):
            raise SystemExit(f"{name} does not implement task 'render'")
        runner.render(save_path=args.save_dir or None)
    elif args.task == "validate_mesh":
        runner.validate_mesh(world_space=True, resolution=512,
                             threshold=args.mcube_threshold)


if __name__ == "__main__":
    main()
