#!/usr/bin/env bash
# Single-host debug/smoke run — the reference's `finetune_large_debug.sh`
# role (10-minute smoke on the gpu-a100:test partition) without a scheduler:
# runs the debug config on whatever local chips exist (or CPU with a
# virtual 8-device mesh when SMOKE_CPU=1).
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG=${1:-asr_finetune_tpu/configs/nano_debug.config}

if [[ "${SMOKE_CPU:-0}" == "1" ]]; then
  export JAX_PLATFORMS=cpu
  export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
fi

exec python -m asr_finetune_tpu.cli.train_hyper -c "$CONFIG" --debug "${@:2}"
