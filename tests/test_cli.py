"""run.py CLI end-to-end smoke (tiny models, CPU)."""

import os

import numpy as np
import pytest

from tclight_tpu.utils.video_io import save_frames


@pytest.mark.slow
def test_run_cli_tiny(tmp_path, rng, monkeypatch):
    frames = rng.uniform(0.2, 0.8, (5, 32, 32, 3)).astype(np.float32)
    vid = tmp_path / "vid"
    save_frames(frames, vid)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
work_dir: "{tmp_path}/wd"
data:
  scene_type: video
  rgb_path: "{vid}"
  height: 32
  width: 32
  fps: 8
  flow_model: farneback
generation:
  guidance_scale: 2.0
  n_timesteps: 2
  chunk_size: 4
  noise_mode: same
  alpha_t: 0.0
  frame_range: [0, -1, 1]
  save_frame: false
  prompt: "soft morning light"
  negative_prompt: "bad"
  output_path: "{tmp_path}/out"
post_opt:
  apply_opt: true
  epochs_exposure: 1
  epochs: 1
  batch_size: 4
  ms_ssim_levels: 2
seed: 3
""")
    monkeypatch.setenv("TCLIGHT_TINY", "1")
    import run as run_cli

    rc = run_cli.main(["--config", str(cfg)])
    assert rc == 0
    out_dirs = list((tmp_path / "out").iterdir())
    assert out_dirs, "no output written"
    files = {p.name for p in out_dirs[0].iterdir()}
    assert "output.mp4" in files and "config.yaml" in files
    # cost fields recorded (reference: saved-config cost contract)
    import yaml

    saved = yaml.safe_load((out_dirs[0] / "config.yaml").read_text())
    assert "total_time" in saved and "sec_per_frame" in saved
