"""TC-Light TPU CLI — mirrors the reference's run.py (:8-32).

Usage:
    python run.py --config configs/tclight_default.yaml -i video.mp4 -p "prompt"

Config additions vs the reference:
    model_dir: directory with local safetensors checkpoints
        (see tclight_tpu/pipeline/iclight.py docstring for layout).
    If model_dir is unset/missing, set TCLIGHT_TINY=1 to run the full
    pipeline with random-weight tiny models (smoke/perf mode).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path


def main(argv=None) -> int:
    from tclight_tpu.config import load_config
    from tclight_tpu.data.dataparsers import make_data_parser
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import build_tiny_iclight, load_iclight
    from tclight_tpu.pipeline.invert import Inverter
    from tclight_tpu.utils.logging import get_logger
    from tclight_tpu.utils.video_io import count_frames, get_frame_ids

    log = get_logger()
    config = load_config(argv)

    sd_version = config.get("sd_version", "iclight")
    model_dir = config.get("model_dir")
    if model_dir and Path(str(model_dir)).exists():
        if sd_version != "iclight":
            # generic SD editing path (inversion/PnP/ControlNet/depth)
            from tclight_tpu.pipeline.iclight import load_sd

            models = load_sd(
                model_dir, sd_version=str(sd_version),
                num_inference_steps=config.get_path("generation.n_timesteps", 50),
                control=str(config.get_path("generation.control", "none")),
            )
        else:
            mode = "fbc" if config.get_path("generation.background_cond") else "fc"
            models = load_iclight(model_dir, mode=mode,
                                  num_inference_steps=config.get_path("generation.n_timesteps", 25))
    elif os.environ.get("TCLIGHT_TINY"):
        log.warning("no model_dir; using tiny random-weight models (TCLIGHT_TINY)")
        models = build_tiny_iclight(
            num_inference_steps=config.get_path("generation.n_timesteps", 25) or 25
        )
    else:
        log.error("config.model_dir missing or not found; set it to a local "
                  "checkpoint dir or export TCLIGHT_TINY=1 for a smoke run")
        return 2

    parser = make_data_parser(config.data)
    n_total = count_frames(config.data.rgb_path)
    frame_ids = get_frame_ids(
        config.get_path("generation.frame_range"),
        config.get_path("generation.frame_ids"),
        n_total=n_total,
    )

    if sd_version != "iclight":
        inverter = Inverter(models, config, data_parser=parser)
        inverter(config.get_path("inversion.save_path"), frame_ids)

    generator = Generator(models, config, data_parser=parser)
    generator(
        config.get_path("generation.latents_path"),
        config.get_path("generation.output_path") or config.get("work_dir"),
        frame_ids,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
