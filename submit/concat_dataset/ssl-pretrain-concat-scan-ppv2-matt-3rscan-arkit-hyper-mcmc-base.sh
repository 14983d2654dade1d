#!/bin/bash
# Reference: submit/concat_dataset/ssl-pretrain-concat-scan-ppv2-matt-3rscan-arkit-hyper-mcmc-base.sh
set -euo pipefail
cd "$(dirname "$0")/../.."
PYTHONPATH=. python tools/ssl_pretrain.py \
  --config-file configs/concat_dataset/ssl-pretrain-concat-scan-ppv2-matt-3rscan-arkit-hyper-mcmc-base.py \
  --options save_path=exp/ssl_pretrainer/concat-base "$@"
