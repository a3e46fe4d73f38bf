"""VBench runner wrapper (tools/eval_vbench.py:1-158 in the reference).

Runs the `vbench` package over generated videos when it is installed (an
external eval suite, not baked into this image); prints the standard
consistency dimensions TC-Light reports. Mirrors the reference CLI:
prompt/prompt_file routing (custom_input only), category + imaging-quality
preprocessing passthrough, and the distributed path — `vbench.distributed`
dist_init/print0 when the package ships them (torch.distributed
multi-process eval), rank-0-only printing otherwise. Degrades to a clear
message without the package.
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import datetime
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
    p.add_argument("--full_json_dir", default=None,
                   help="VBench_full_info.json dir (vbench_standard mode)")
    p.add_argument("--dimension", nargs="*", default=DIMENSIONS)
    p.add_argument("--mode", default="custom_input",
                   choices=["custom_input", "vbench_standard"])
    p.add_argument("--prompt", default="None",
                   help="single prompt for all videos (custom_input)")
    p.add_argument("--prompt_file", default=None,
                   help='json {"video_path": prompt, ...} (custom_input)')
    p.add_argument("--category", default="")
    p.add_argument("--load_ckpt_from_local", action="store_true")
    p.add_argument("--read_frame", action="store_true")
    p.add_argument("--imaging_quality_preprocessing_mode", default="longer",
                   choices=["shorter", "longer", "shorter_centercrop", "None"])
    args = p.parse_args(argv)

    try:
        from vbench import VBench
    except ImportError:
        print("[WARN] the `vbench` package is not installed in this "
              "environment; install it to run VBench dimensions:",
              ", ".join(args.dimension))
        return 0

    # distributed path: vbench ships torch.distributed helpers; fall back
    # to single-process with plain print when absent
    try:
        from vbench.distributed import dist_init, print0
        dist_init()
    except Exception:
        print0 = print

    import torch

    device = "cuda" if torch.cuda.is_available() else "cpu"
    out = Path(args.output_path)
    out.mkdir(parents=True, exist_ok=True)
    vb = VBench(torch.device(device), args.full_json_dir, str(out))

    if args.prompt_file is not None and args.prompt != "None":
        raise SystemExit("--prompt_file and --prompt cannot be used together")
    if ((args.prompt_file is not None or args.prompt != "None")
            and args.mode != "custom_input"):
        raise SystemExit("external prompts need --mode=custom_input")

    prompt = []
    if args.prompt_file:
        with open(args.prompt_file) as f:
            prompt = json.load(f)
        if not isinstance(prompt, dict):
            raise SystemExit('prompt_file must be {"video_path": prompt, ...}')
    elif args.prompt != "None":
        prompt = [args.prompt]

    kwargs = {}
    if args.category:
        kwargs["category"] = args.category
    kwargs["imaging_quality_preprocessing_mode"] = (
        args.imaging_quality_preprocessing_mode)

    print0(f"start evaluation: {args.dimension}")
    stamp = datetime.now().strftime("%Y-%m-%d-%H:%M:%S")
    vb.evaluate(
        videos_path=args.videos_path,
        name=f"results_{stamp}",
        prompt_list=prompt,  # [] reads prompts from filenames
        dimension_list=list(args.dimension),
        local=args.load_ckpt_from_local,
        read_frame=args.read_frame,
        mode=args.mode,
        **kwargs,
    )
    print0("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
