"""mp4/gif -> numbered image frames (tools/video2img.py)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root (tools run as scripts)

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--ext", default="png")
    p.add_argument("--frame_range", type=int, nargs=3, default=None,
                   metavar=("START", "END", "STEP"))
    args = p.parse_args(argv)

    from tclight_tpu.utils.video_io import get_frame_ids, load_video, save_frames

    ids = get_frame_ids(args.frame_range) if args.frame_range else None
    frames = load_video(args.input, frame_ids=ids)
    save_frames(frames, args.output_dir, ext=args.ext)
    print(f"wrote {len(frames)} frames -> {args.output_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
