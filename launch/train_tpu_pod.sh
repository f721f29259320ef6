#!/usr/bin/env bash
# Multi-host TPU pod launcher.
#
# Replaces the reference's Slurm→Ray bootstrap
# (finetune_large_debug_multi_node.sh:63-96: head `ray start`, worker joins
# via $ip_head, then `python train.py -c config`). On TPU pods there is no
# cluster to bootstrap — every host runs the SAME single-controller process
# and jax.distributed wires them up; the coordinator address plays the
# ip_head role (parallel/mesh.py initialize_distributed reads either name).
#
# Usage:
#   ./launch/train_tpu_pod.sh <tpu-name> <zone> <config-file> [extra flags...]
#
# Single host (v4-8 / v5e-8): just run
#   python -m asr_finetune_tpu.cli.train_hyper -c <config>
set -euo pipefail

TPU_NAME=${1:?tpu name}
ZONE=${2:?zone}
CONFIG=${3:?config file}
shift 3

REPO_DIR=${REPO_DIR:-$(cd "$(dirname "$0")/.." && pwd)}
COORD_PORT=${COORD_PORT:-8476}

# host 0's internal IP becomes the coordinator (the ip_head analogue)
COORD_IP=$(gcloud compute tpus tpu-vm describe "$TPU_NAME" --zone "$ZONE" \
  --format='value(networkEndpoints[0].ipAddress)')
export ip_head="${COORD_IP}:${COORD_PORT}"
echo "coordinator (ip_head): $ip_head"

gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd $REPO_DIR && \
    COORDINATOR_ADDRESS=$ip_head \
    python -m asr_finetune_tpu.cli.train_hyper -c $CONFIG $*"
