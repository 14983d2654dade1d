#!/bin/bash
# Reference: submit/ssl-pretrain-scannetpp-mcmc.sh
set -euo pipefail
cd "$(dirname "$0")/.."
PYTHONPATH=. python tools/ssl_pretrain.py \
  --config-file configs/scannetpp/ssl-pretrain-scannetpp-all-base.py \
  --options save_path=exp/ssl_pretrainer/scannetpp-mcmc "$@"
