"""Training entry point (reference: tools/train.py).

Usage:
    python tools/train.py --config-file configs/.../xxx.py \
        [--options save_path=exp/run1 batch_size=2 ...]

Multi-chip execution is single-controller: all local TPU devices join a data
mesh automatically (no per-GPU process spawning / NCCL rendezvous like the
reference's engines/launch.py — pjit handles the collectives).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenesplat_tpu


def default_argument_parser():
    parser = argparse.ArgumentParser("scenesplat_tpu training")
    parser.add_argument("--config-file", required=True)
    parser.add_argument(
        "--options", nargs="*", default=None, help="key=value config overrides"
    )
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument(
        "--multihost",
        action="store_true",
        help="join a multi-host TPU pod run (jax.distributed.initialize; "
        "reference --multi_node, tools/train.py:24-60)",
    )
    return parser


def main():
    args = default_argument_parser().parse_args()
    scenesplat_tpu.apply_platform_env()
    scenesplat_tpu.setup_compilation_cache()

    if args.multihost:
        from scenesplat_tpu.parallel.mesh import initialize_multihost

        initialize_multihost()

    from scenesplat_tpu.engines.train import build_trainer
    from scenesplat_tpu.utils.config import Config
    from scenesplat_tpu.utils.env import set_seed

    cfg = Config.fromfile(args.config_file)
    cfg.merge_from_options(args.options)
    cfg.setdefault("save_path", os.path.join("exp", "default"))
    os.makedirs(cfg.save_path, exist_ok=True)
    cfg.dump(os.path.join(cfg.save_path, "config.py"))
    set_seed(cfg.get("seed", 0))

    trainer = build_trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
