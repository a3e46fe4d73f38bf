"""Text2World CLI: prompt -> guardrail -> EDM-sampled DiT -> chunked
tokenizer decode -> mp4, with per-component offloading.

Mirror of cosmos1/models/diffusion/inference/text2world.py:160. Demo run
(tiny random-weight models, single chip):

    python tools/text2world.py --prompt "a corgi on a beach" \
        --height 64 --width 64 --num_video_frames 5 --num_steps 8 \
        --offload_diffusion_transformer --video_save_folder /tmp/t2w
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # repo root (tools run as scripts)

import argparse
import sys


def parse_arguments(argv=None):
    p = argparse.ArgumentParser(description="Text to world generation")
    from tclight_tpu.cosmos.inference_cli import add_common_arguments

    add_common_arguments(p)
    p.add_argument("--diffusion_transformer_dir", type=str,
                   default="Cosmos-1.0-Diffusion-7B-Text2World")
    p.add_argument("--prompt_upsampler_dir", type=str,
                   default="Cosmos-1.0-Prompt-Upsampler-12B-Text2World")
    p.add_argument("--word_limit_to_skip_upsampler", type=int, default=None)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_arguments(argv)
    from tclight_tpu.cosmos.inference_cli import build_pipeline, run_generation

    pipeline, tokenizer = build_pipeline(args, video2world=False)
    return run_generation(args, pipeline, tokenizer)


if __name__ == "__main__":
    sys.exit(main())
