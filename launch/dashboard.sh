#!/usr/bin/env bash
# Observability stack — the reference's Grafana/Prometheus/Ray-dashboard
# wiring (finetune_large_debug_dashboard.sh:118-200) replaced by
# TensorBoard: training scalars land in each trial's metrics dir
# (utils/logging_utils.py) and `utils/profiling.trace` writes XLA profiles
# readable by the TensorBoard Profile tab. Multi-host runs additionally
# write one `host<i>/` TB run + `metrics_host<i>.jsonl` PER PROCESS
# (RSS/HBM series), so pointing this at the storage dir shows every
# node's utilization live — the per-node view the reference got from
# Grafana/Prometheus (finetune_large_debug_dashboard.sh:118-200).
#
# Usage: ./launch/dashboard.sh <output-or-storage-dir> [port]
set -euo pipefail
LOGDIR=${1:?log dir (output_dir or storage_path)}
PORT=${2:-6006}
exec python -m tensorboard.main --logdir "$LOGDIR" --port "$PORT" --bind_all
