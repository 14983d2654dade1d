#!/bin/bash
# FLAGSHIP joint VL pretraining. Reference: submit/concat_dataset/
# lang-pretrain-concat-scan-ppv2-matt-mcmc-wo-normal-contrastive[-nccl].sh
# (16x H100 over 4 nodes). TPU pod equivalent: run via launch_tpu_pod.sh for
# multi-host, or directly on a single host; batch sizes are global.
set -euo pipefail
cd "$(dirname "$0")/../.."
PYTHONPATH=. python tools/train.py \
  --config-file configs/concat_dataset/lang-pretrain-concat-scan-ppv2-matt-mcmc-wo-normal-contrastive.py \
  --options save_path=exp/lang_pretrainer/concat-scan-ppv2-matt-mcmc-wo-normal-contrastive "$@"
