"""Average one named metric file across multiple dataset output dirs
(reference: tools/avg_datasets_metrics.py — takes explicit --output_dirs
and a --txt_name, skips missing files, prints per-metric means).

Differs from tools/avg_metrics.py, which recursively discovers every
result.txt under ONE root; this tool averages the SAME file name across an
explicit list of roots (one per dataset)."""

from __future__ import annotations

import argparse
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
from avg_metrics import parse_result_txt  # noqa: E402


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output_dirs", type=str, nargs="+", required=True)
    p.add_argument("--txt_name", type=str, default="result.txt")
    args = p.parse_args(argv)

    metrics = defaultdict(list)
    used = []
    for output_dir in args.output_dirs:
        path = Path(output_dir) / args.txt_name
        if not path.exists():
            print(f"[INFO] {path} not exists, skipped.")
            continue
        used.append(output_dir)
        for k, v in parse_result_txt(path).items():
            metrics[k].append(v)

    if not metrics:
        print("no metric files found")
        return 1
    print(f"Averaged metrics over {len(used)} dirs:")
    for k in sorted(metrics):
        vals = metrics[k]
        print(f"{k}: {sum(vals) / len(vals):.4f}  (n={len(vals)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
