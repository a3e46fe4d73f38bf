"""Inversion -> generation resume and PnP editing path e2e
(reference: invert.py + generate_utils.py use_pnp wiring — init noise from
noisy_latents_{t}, per-timestep source latents, [src|uncond|cond] batch)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.config import ConfigDict
from tclight_tpu.data.dataparsers import VideoDataParser
from tclight_tpu.pipeline.generator import Generator
from tclight_tpu.pipeline.iclight import build_tiny_sd
from tclight_tpu.pipeline.invert import (
    Inverter, check_latent_exists, load_latent)
from tclight_tpu.utils.video_io import save_frames

from test_pipeline_e2e import make_config, make_synthetic_video

pytestmark = pytest.mark.slow  # module fixture inverts a tiny SD (~90 s on 1 CPU)

N_STEPS = 3


def make_sd_config(tmp_path, vid_dir, **gen_overrides):
    cfg = make_config(tmp_path, vid_dir, n_timesteps=N_STEPS,
                      **gen_overrides)
    cfg["sd_version"] = "1.5"
    cfg["inversion"] = {
        "steps": N_STEPS, "save_steps": N_STEPS, "save_intermediate": True,
        "batch_size": 4, "prompt": "", "recon": False, "force": False,
        "save_path": str(tmp_path / "latents"),
    }
    cfg["post_opt"]["apply_opt"] = False
    return cfg


@pytest.fixture(scope="module")
def inverted(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("pnp")
    vid_dir, frames = make_synthetic_video(tmp_path, n=4)
    cfg = make_sd_config(tmp_path, vid_dir)
    models = build_tiny_sd(seed=0, num_inference_steps=N_STEPS, latent_base=2)
    parser = VideoDataParser(cfg["data"])
    frame_ids = list(range(4))
    inverter = Inverter(models, cfg, data_parser=parser)
    inverter(cfg["inversion"]["save_path"], frame_ids)
    return tmp_path, vid_dir, cfg, models, parser, frame_ids


def test_inversion_saves_all_timesteps(inverted):
    _, _, cfg, models, _, frame_ids = inverted
    save_path = cfg["inversion"]["save_path"]
    for t in models.scheduler.timesteps():
        assert check_latent_exists(save_path, float(t), frame_ids), t
    arr = load_latent(save_path, float(models.scheduler.timesteps()[0]),
                      frame_ids)
    assert arr.shape[0] == len(frame_ids)
    assert np.isfinite(arr).all()


def test_generator_resumes_from_inverted_latents(inverted):
    tmp_path, vid_dir, cfg, models, parser, frame_ids = inverted
    gen = Generator(models, cfg, data_parser=parser)
    t0 = float(gen.scheduler.timesteps()[0])
    expected = load_latent(cfg["inversion"]["save_path"], t0, frame_ids)
    init = gen._load_inverted_latents(
        cfg["inversion"]["save_path"], frame_ids,
        gen.prepare_init_noise(4, 16, 16, 7))
    np.testing.assert_allclose(np.asarray(init), expected)


def test_missing_latents_falls_back(inverted, tmp_path):
    _, _, cfg, models, parser, frame_ids = inverted
    gen = Generator(models, cfg, data_parser=parser)
    fresh = gen.prepare_init_noise(4, 16, 16, 7)
    out = gen._load_inverted_latents(str(tmp_path / "nope"), frame_ids, fresh)
    assert out is fresh


@pytest.mark.slow
def test_pnp_generation_e2e(inverted):
    tmp_path, vid_dir, cfg, models, parser, frame_ids = inverted

    def run(control):
        c = ConfigDict(dict(cfg))
        c["generation"] = dict(cfg["generation"])
        c["generation"]["control"] = control
        gen = Generator(models, c, data_parser=parser)
        out = gen(cfg["inversion"]["save_path"],
                  str(tmp_path / f"out_{control}"), frame_ids)
        return next(iter(out.values()))

    out_pnp = run("pnp")
    out_plain = run("none")
    assert np.isfinite(out_pnp).all()
    # injection must steer the result measurably away from the plain run
    assert np.abs(out_pnp - out_plain).max() > 1e-4


def test_pnp_requires_latents(inverted, tmp_path):
    _, vid_dir, cfg, models, parser, frame_ids = inverted
    c = ConfigDict(dict(cfg))
    c["generation"] = dict(cfg["generation"])
    c["generation"]["control"] = "pnp"
    gen = Generator(models, c, data_parser=parser)
    with pytest.raises(FileNotFoundError):
        gen(str(tmp_path / "missing_latents"),
            str(tmp_path / "out_fail"), frame_ids)
