#!/bin/bash
# Reference: submit/lang-pretrain-scannet-mcmc-wo-normal-contrastive.sh
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH=. python tools/train.py \
  --config-file configs/scannet/lang-pretrain-scannet-mcmc-wo-normal-contrastive.py \
  --options save_path=exp/lang_pretrainer/scannet-mcmc-wo-normal-contrastive "$@"
