"""Average metrics across run dirs (tools/avg_metrics.py +
tools/avg_datasets_metrics.py in the reference): parses result.txt files
(and vbench json when present) under --output_dir and prints per-metric
means."""

from __future__ import annotations

import argparse
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def parse_result_txt(path: Path) -> dict[str, float]:
    metrics = {}
    for line in path.read_text().splitlines():
        m = re.match(r"([\w\-\(\)\.z_ ]+):\s*([-\d\.eE]+)\s*$", line.strip())
        if m:
            try:
                metrics[m.group(1).strip()] = float(m.group(2))
            except ValueError:
                pass
    return metrics


def collect(output_dir: Path) -> dict[str, list[float]]:
    all_metrics = defaultdict(list)
    for rt in sorted(output_dir.rglob("result.txt")):
        for k, v in parse_result_txt(rt).items():
            all_metrics[k].append(v)
    for vb in sorted(output_dir.rglob("*vbench*.json")):
        try:
            data = json.loads(vb.read_text())
            for k, v in data.items():
                if isinstance(v, (int, float)):
                    all_metrics[f"vbench/{k}"].append(float(v))
                elif isinstance(v, list) and v and isinstance(v[0], (int, float)):
                    all_metrics[f"vbench/{k}"].append(float(v[0]))
        except Exception:
            pass
    return all_metrics


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--output_dir", type=str, default="workdir")
    args = p.parse_args(argv)
    metrics = collect(Path(args.output_dir))
    if not metrics:
        print("no result.txt files found")
        return 1
    for k in sorted(metrics):
        vals = metrics[k]
        print(f"{k}: {sum(vals) / len(vals):.4f}  (n={len(vals)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
