#!/bin/bash
# Reference: submit/ssl-pretrain-scannet-mcmc.sh
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH=. python tools/ssl_pretrain.py \
  --config-file configs/scannet/ssl-pretrain-scannet-all-base.py \
  --options save_path=exp/ssl_pretrainer/scannet-mcmc "$@"
