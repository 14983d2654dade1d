#!/bin/bash
# Multi-host TPU pod launcher — the TPU-native counterpart of the reference's
# SLURM/NCCL scripts (reference submit/concat_dataset/*-nccl.sh:1-60).
#
# Instead of srun + mp.spawn + NCCL rendezvous, a TPU pod runs ONE python
# process per host; jax.distributed.initialize() discovers the coordinator
# from TPU metadata and every host sees the global device mesh. Batch sizes
# in configs are GLOBAL (pjit shards them) — no per-rank division needed.
#
# Usage:
#   ./submit/launch_tpu_pod.sh <tpu-name> <zone> <entry> <config> [extra opts...]
# e.g.
#   ./submit/launch_tpu_pod.sh my-v5p-16 us-east5-a tools/train.py \
#       configs/concat_dataset/lang-pretrain-concat-scan-ppv2-matt-mcmc-wo-normal-contrastive.py \
#       save_path=exp/flagship
set -euo pipefail

TPU_NAME=$1; ZONE=$2; ENTRY=$3; CONFIG=$4; shift 4
WORKDIR=${SCENESPLAT_WORKDIR:-'$HOME/scenesplat_tpu'}

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd $WORKDIR && \
    PYTHONPATH=. python $ENTRY --config-file $CONFIG --multihost \
      ${*:+--options $*}"
