"""CLI entry point.

Parity target: `/root/reference/tools/run_net.py` — same flags
(``--config-file``, ``--task {train,test,render,validate_mesh}``,
``--type {novel_view,mesh}``, ``--mcube_threshold``).  The sm-arch guard is
replaced by a JAX backend report.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from jnerf_tpu.utils.config import init_cfg


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
    args = parser.parse_args()

    print("jax backend:", jax.default_backend(), jax.devices())
    assert args.config_file, "--config-file is required"
    init_cfg(args.config_file)

    if args.type == "mesh":
        from jnerf_tpu.runner.neus_runner import NeuSRunner

        runner = NeuSRunner(is_continue=(args.task == "validate_mesh"))
    else:
        from jnerf_tpu.runner import Runner

        runner = Runner()

    if args.task == "train":
        runner.train()
    elif args.task == "test":
        runner.test(load_ckpt=True)
    elif args.task == "render":
        runner.render(save_path=args.save_dir or None)
    elif args.task == "validate_mesh":
        runner.validate_mesh(world_space=True, resolution=512,
                             threshold=args.mcube_threshold)


if __name__ == "__main__":
    main()
