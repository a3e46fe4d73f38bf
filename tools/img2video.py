"""Image sequence -> mp4/gif with optional crop (tools/img2video.py)."""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root (tools run as scripts)

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True, help="directory of frames")
    p.add_argument("--output", required=True, help="output .mp4/.gif")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--crop", type=int, nargs=4, metavar=("Y0", "Y1", "X0", "X1"),
                   default=None)
    args = p.parse_args(argv)

    from tclight_tpu.utils.video_io import load_video, save_video

    frames = load_video(args.input_dir)
    if args.crop:
        y0, y1, x0, x1 = args.crop
        frames = frames[:, y0:y1, x0:x1]
    save_video(frames, args.output, fps=args.fps)
    print(f"wrote {len(frames)} frames -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
