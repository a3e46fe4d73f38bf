"""VBench runner wrapper (tools/eval_vbench.py:111-158 in the reference).

Runs the `vbench` package CLI over generated videos when it is installed
(it is an external eval suite, not baked into this image); prints the
standard consistency dimensions TC-Light reports. Degrades to a clear
message otherwise.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

DIMENSIONS = [
    "subject_consistency",
    "background_consistency",
    "motion_smoothness",
    "aesthetic_quality",
    "imaging_quality",
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--videos_path", required=True)
    p.add_argument("--output_path", default="vbench_results")
    p.add_argument("--dimension", nargs="*", default=DIMENSIONS)
    p.add_argument("--mode", default="custom_input",
                   choices=["custom_input", "vbench_standard"])
    args = p.parse_args(argv)

    try:
        from vbench import VBench
    except ImportError:
        print("[WARN] the `vbench` package is not installed in this "
              "environment; install it to run VBench dimensions:",
              ", ".join(args.dimension))
        return 0

    import torch

    device = "cuda" if torch.cuda.is_available() else "cpu"
    out = Path(args.output_path)
    out.mkdir(parents=True, exist_ok=True)
    vb = VBench(device, full_info_dir=None, output_path=str(out))
    vb.evaluate(
        videos_path=args.videos_path,
        name="tclight",
        dimension_list=list(args.dimension),
        mode=args.mode,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
