"""SimDINO SSL pretraining entry point (reference: tools/ssl_pretrain.py:1-74).

Identical CLI to tools/train.py but defaults the trainer to the SSL
pretrainer (reference builds PRETRAINERS["DefaultSSLPreTrainer"]; here the
pretrainer is registered in the same TRAINERS registry, engines/pretrain.py).

Usage:
    python tools/ssl_pretrain.py --config-file configs/scannet/ssl-pretrain-scannet-all-base.py \
        [--options save_path=exp/ssl ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scenesplat_tpu
from train import default_argument_parser


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
    cfg.setdefault("train", dict(type="DefaultSSLPreTrainer"))
    cfg.setdefault("save_path", os.path.join("exp", "ssl_default"))
    os.makedirs(cfg.save_path, exist_ok=True)
    cfg.dump(os.path.join(cfg.save_path, "config.py"))
    set_seed(cfg.get("seed", 0))

    trainer = build_trainer(cfg)
    trainer.train()


if __name__ == "__main__":
    main()
