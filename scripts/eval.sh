#!/usr/bin/env bash
# Evaluate all runs under workdir (scripts/eval.sh in the reference).
set -euo pipefail
cd "$(dirname "$0")/.."

OUTPUT_DIR="${1:-workdir}"
python evaluate.py --output_dir "$OUTPUT_DIR" --eval_cost
python tools/avg_metrics.py --output_dir "$OUTPUT_DIR"
