#!/bin/bash
# Reference: submit/lang-pretrain-matt-mcmc-wo-normal-contrastive.sh
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH=. python tools/train.py \
  --config-file configs/matterport3d/lang-pretrain-matt-mcmc-wo-normal-contrastive.py \
  --options save_path=exp/lang_pretrainer/matt-mcmc-wo-normal-contrastive "$@"
