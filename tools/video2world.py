"""Video2World CLI: conditioning image/video + prompt -> guardrail ->
condition-latent-clamped EDM sampling -> chunked tokenizer decode -> mp4.

Mirror of cosmos1/models/diffusion/inference/video2world.py:178. Demo run
(tiny random-weight models, single chip):

    python tools/video2world.py --input_image_or_video_path in.png \
        --prompt "the camera pans right" --height 64 --width 64 \
        --num_video_frames 5 --num_steps 8 --video_save_folder /tmp/v2w
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root (tools run as scripts)

import argparse
import sys

import numpy as np


def parse_arguments(argv=None):
    p = argparse.ArgumentParser(description="Video to world generation")
    from tclight_tpu.cosmos.inference_cli import add_common_arguments

    add_common_arguments(p)
    p.add_argument("--diffusion_transformer_dir", type=str,
                   default="Cosmos-1.0-Diffusion-7B-Video2World")
    p.add_argument("--prompt_upsampler_dir", type=str,
                   default="Pixtral-12B")
    p.add_argument("--input_image_or_video_path", type=str, required=True)
    p.add_argument("--num_input_frames", type=int, default=1,
                   choices=(1, 9), help="frames to condition on")
    return p.parse_args(argv)


def _load_condition(path: str, h: int, w: int, n: int) -> np.ndarray:
    """Load the conditioning image/video, resized to the target size,
    scaled to [-1, 1], shaped (1, n, H, W, 3)."""
    from tclight_tpu.utils.video_io import load_video

    frames = load_video(path, height=h, width=w)
    frames = np.asarray(frames, np.float32)
    if frames.max() > 1.5:
        frames = frames / 255.0
    if frames.shape[0] < n:
        frames = np.concatenate(
            [frames[:1]] * (n - frames.shape[0]) + [frames], axis=0)
    return frames[None, -n:] * 2.0 - 1.0


def main(argv=None) -> int:
    args = parse_arguments(argv)
    from tclight_tpu.cosmos.inference_cli import build_pipeline, run_generation

    pipeline, tokenizer = build_pipeline(args, video2world=True)
    pcd = tokenizer.pixel_chunk_duration
    cond = _load_condition(args.input_image_or_video_path, args.height,
                           args.width, pcd)
    return run_generation(args, pipeline, tokenizer, condition_video=cond)


if __name__ == "__main__":
    sys.exit(main())
