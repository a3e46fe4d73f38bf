"""End-to-end smoke: tiny random-weight IC-Light stack over a synthetic
video, through sampling + post-optimization + outputs on disk
(SURVEY §4 fixture (d) shape, CPU-runnable)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.config import ConfigDict
from tclight_tpu.data.dataparsers import VideoDataParser
from tclight_tpu.pipeline.generator import Generator
from tclight_tpu.pipeline.iclight import build_tiny_iclight
from tclight_tpu.utils.video_io import save_frames


def make_synthetic_video(tmp_path, n=6, h=32, w=32):
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
    frames = []
    for t in range(n):
        f = np.roll(base, shift=2 * t, axis=1)
        frames.append(f)
    frames = np.stack(frames)
    vid_dir = tmp_path / "vid"
    save_frames(frames, vid_dir)
    return vid_dir, frames


def make_config(tmp_path, vid_dir, **gen_overrides):
    gen = dict(
        guidance_scale=2.0, n_timesteps=2, chunk_size=4, chunk_ord="mix-4",
        local_merge_ratio=0.5, merge_global=True, global_merge_ratio=0.5,
        align_batch=True, max_downsample=2, noise_mode="same",
        alpha_t=0.0, final_factor_t=0.01, win_size_t=4,
        prompt_t="best quality", negative_prompt_t="jittery",
        negative_prompt="bad quality", prompt={"test": "warm sunset light"},
        save_frame=False,
    )
    gen.update(gen_overrides)
    return ConfigDict({
        "work_dir": str(tmp_path / "wd"),
        "data": {"scene_type": "video", "rgb_path": str(vid_dir),
                 "height": 32, "width": 32, "fps": 8,
                 "flow_model": "farneback"},
        "generation": gen,
        "post_opt": {"apply_opt": True, "epochs_exposure": 2, "epochs": 2,
                     "batch_size": 4, "lambda_dssim": 0.2, "lambda_flow": 0.8,
                     "lambda_tv": 0.05, "feature_lr": 0.05,
                     "exposure_lr_init": 0.01, "exposure_lr_final": 0.001,
                     "exposure_lr_delay_steps": 0, "exposure_lr_delay_mult": 0.0,
                     "ms_ssim_levels": 2},
        "seed": 7,
    })


@pytest.mark.slow
def test_end_to_end_relight(tmp_path):
    vid_dir, frames = make_synthetic_video(tmp_path)
    cfg = make_config(tmp_path, vid_dir)
    models = build_tiny_iclight(seed=0, num_inference_steps=2)
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)
    results = gen(None, str(tmp_path / "out"), list(range(6)))
    out = results["test"]
    assert out.shape == frames.shape
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()
    # outputs on disk
    out_dirs = list((tmp_path / "out").iterdir())
    assert len(out_dirs) == 1
    files = {p.name for p in out_dirs[0].iterdir()}
    assert {"output.mp4", "output_gt.mp4", "config.yaml"} <= files


@pytest.mark.slow
def test_end_to_end_multi_axis(tmp_path):
    """yt-plane denoising path (alpha_t > 0)."""
    vid_dir, frames = make_synthetic_video(tmp_path, n=5, h=32, w=32)
    cfg = make_config(tmp_path, vid_dir, alpha_t=0.3, win_size_t=4)
    cfg.post_opt.apply_opt = False
    models = build_tiny_iclight(seed=0, num_inference_steps=2, latent_base=16)
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)
    gen.apply_opt = False
    results = gen(None, str(tmp_path / "out"), list(range(5)))
    out = results["test"]
    assert out.shape == (5, 32, 32, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_end_to_end_multi_axis_chunk_size_t(tmp_path):
    """chunk_size_t > chunk_size binds a dedicated yt UNet variant
    (ToMeSpec n_frames=chunk_size_t) and still produces a valid video."""
    vid_dir, frames = make_synthetic_video(tmp_path, n=5, h=32, w=32)
    cfg = make_config(tmp_path, vid_dir, alpha_t=0.3, win_size_t=4,
                      chunk_size=2, chunk_size_t=4)
    cfg.post_opt.apply_opt = False
    models = build_tiny_iclight(seed=0, num_inference_steps=2, latent_base=16)
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)
    gen.apply_opt = False
    results = gen(None, str(tmp_path / "out"), list(range(5)))
    out = results["test"]
    assert out.shape == (5, 32, 32, 3)
    assert np.isfinite(out).all()
    assert gen._yt_cs == 4 and gen._yt_unet.tome_spec.n_frames == 4


@pytest.mark.slow
def test_prompt_encoding_long_prompt():
    models = build_tiny_iclight(seed=0)
    cfg = ConfigDict({"generation": {"prompt": {"a": "x"}}, "seed": 0})
    gen = Generator(models, cfg)
    long_prompt = " ".join(["word"] * 200)  # > 75 tokens -> 3 chunks
    cond, uncond = gen.encode_prompt_pair(long_prompt, "short negative")
    assert cond.shape[1] == uncond.shape[1]
    assert cond.shape[1] % 77 == 0 and cond.shape[1] >= 3 * 77


@pytest.mark.slow
def test_end_to_end_fbc_background(tmp_path):
    """fbc (12-ch) background-conditioned path with a background video."""
    vid_dir, frames = make_synthetic_video(tmp_path, n=4)
    bg_dir = tmp_path / "bg"
    rng = np.random.default_rng(1)
    save_frames(rng.uniform(0.2, 0.8, (4, 32, 32, 3)).astype(np.float32), bg_dir)
    cfg = make_config(tmp_path, vid_dir,
                      background_image_path=str(bg_dir))
    cfg.post_opt.apply_opt = False
    models = build_tiny_iclight(seed=0, num_inference_steps=2, in_channels=12)
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)
    gen.apply_opt = False
    results = gen(None, str(tmp_path / "out"), list(range(4)))
    out = results["test"]
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(out).all()


@pytest.mark.slow
def test_rebuild_params_two_prompts(tmp_path):
    """With a rebuild_params factory, the post-opt offload deletes device
    params (no host mirror fetch) and the next prompt re-inits them."""
    import dataclasses

    vid_dir, frames = make_synthetic_video(tmp_path)
    cfg = make_config(tmp_path, vid_dir, prompt={"a": "warm light",
                                                 "b": "cool light"})
    models = build_tiny_iclight(seed=0, num_inference_steps=2)
    calls = []

    import jax

    host_params = jax.tree.map(np.asarray, models.unet_params)

    def rebuild():
        calls.append(1)
        return jax.tree.map(jnp.asarray, host_params)

    models = dataclasses.replace(models, rebuild_params=rebuild)
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)
    results = gen(None, str(tmp_path / "out"), list(range(4)))
    assert set(results) == {"a", "b"}
    # offload after prompt "a" deleted params; prompt "b" rebuilt them
    assert len(calls) == 1
    for out in results.values():
        assert np.isfinite(out).all()


@pytest.mark.slow
def test_split_slot_dispatch_matches_fused(tmp_path):
    """max_fused_slots below the plan size routes sampling through the
    bounded group-dispatch path (long-video mode); the relight must still
    complete and produce the same-shaped, finite output."""
    vid_dir, frames = make_synthetic_video(tmp_path)
    cfg = make_config(tmp_path, vid_dir, max_fused_slots=1)
    models = build_tiny_iclight(seed=0, num_inference_steps=2)
    parser = VideoDataParser(cfg.data)
    gen = Generator(models, cfg, data_parser=parser)
    gen.apply_opt = False
    assert gen.max_fused_slots == 1
    results = gen(None, str(tmp_path / "out"), list(range(6)))
    out = results["test"]
    assert out.shape == frames.shape
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()
