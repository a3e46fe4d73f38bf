"""DPT depth estimator: exact parity vs transformers DPTForDepthEstimation
(the sd2-depth pipeline's depth model class; prepare_depth at
utils/VidToMe/utils.py:215-301)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.dpt import (
    DPTConfig, DPTForDepthEstimation, convert_dpt, prepare_depth_maps)


def _hf_tiny():
    from transformers import DPTConfig as HFCfg
    from transformers import DPTForDepthEstimation as HFModel
    import torch

    hf_cfg = HFCfg(image_size=64, patch_size=16, hidden_size=32,
                   num_hidden_layers=4, num_attention_heads=2,
                   intermediate_size=64, backbone_out_indices=[0, 1, 2, 3],
                   neck_hidden_sizes=[16, 24, 32, 40], fusion_hidden_size=32,
                   is_hybrid=False)
    torch.manual_seed(0)
    return HFModel(hf_cfg).eval()


@pytest.mark.slow
def test_dpt_parity_with_transformers(rng):
    import torch

    hf = _hf_tiny()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = DPTConfig.tiny()
    params = convert_dpt(sd, cfg)
    model = DPTForDepthEstimation(cfg)

    imgs = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(imgs, -1, 1).copy())
                 ).predicted_depth.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(imgs)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_dpt_parity_other_resolution(rng):
    """Position-embedding resize path: run at a resolution different from
    the config image_size."""
    import torch

    hf = _hf_tiny()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = DPTConfig.tiny()
    params = convert_dpt(sd, cfg)
    model = DPTForDepthEstimation(cfg)
    imgs = rng.uniform(-1, 1, size=(1, 96, 96, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(imgs, -1, 1).copy()),
                 ).predicted_depth.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def _hf_tiny_hybrid():
    from transformers import DPTConfig as HFCfg
    from transformers import DPTForDepthEstimation as HFModel
    import torch

    hf_cfg = HFCfg(
        image_size=64, patch_size=16, hidden_size=32,
        num_hidden_layers=4, num_attention_heads=2, intermediate_size=64,
        backbone_out_indices=[0, 1, 2, 3],
        neck_hidden_sizes=[16, 24, 32, 32],
        reassemble_factors=[1, 1, 1, 0.5],
        fusion_hidden_size=32, is_hybrid=True, readout_type="project",
        backbone_featmap_shape=[1, 32, 4, 4],
        backbone_config={
            "global_padding": "same", "layer_type": "bottleneck",
            "depths": [1, 1, 1], "out_features": ["stage1", "stage2",
                                                  "stage3"],
            "embedding_dynamic_padding": True, "embedding_size": 16,
            "hidden_sizes": [16, 24, 32], "num_groups": 4,
        })
    torch.manual_seed(0)
    return HFModel(hf_cfg).eval()


@pytest.mark.slow
def test_dpt_hybrid_parity_with_transformers(rng):
    """DPT-hybrid (BiT stem) — the actual sd2-depth depth backbone."""
    import torch

    hf = _hf_tiny_hybrid()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = DPTConfig.tiny_hybrid()
    params = convert_dpt(sd, cfg)
    model = DPTForDepthEstimation(cfg)

    imgs = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(np.moveaxis(imgs, -1, 1).copy())
                 ).predicted_depth.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(imgs)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.slow
def test_prepare_depth_maps_range(rng):
    cfg = DPTConfig.tiny()
    model = DPTForDepthEstimation(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 3)))
    frames = rng.uniform(size=(3, 48, 48, 3)).astype(np.float32)
    depth = prepare_depth_maps(model, params, frames, (6, 6), input_size=64)
    assert depth.shape == (3, 6, 6, 1)
    d = np.asarray(depth)
    assert d.min() >= -1.0 - 1e-6 and d.max() <= 1.0 + 1e-6
    # per-frame normalization covers the full range
    assert np.allclose(d.max(axis=(1, 2, 3)), 1.0, atol=1e-5)


@pytest.mark.slow
def test_sd_depth_pipeline_e2e(tmp_path, rng):
    """5-channel sd-depth UNet driven end-to-end with an injected tiny
    depth estimator (generation + inversion paths)."""
    import dataclasses
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_pipeline_e2e import make_config, make_synthetic_video

    from tclight_tpu.data.dataparsers import VideoDataParser
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import build_tiny_iclight
    from tclight_tpu.diffusion.schedulers import DDIMStateScheduler

    vid_dir, _ = make_synthetic_video(tmp_path, n=4)
    models = build_tiny_iclight(seed=0, num_inference_steps=2, in_channels=5)
    models = dataclasses.replace(
        models, model_key="depth",
        scheduler=DDIMStateScheduler(num_inference_steps=2))

    cfg = make_config(tmp_path, vid_dir, n_timesteps=2)
    cfg["post_opt"]["apply_opt"] = False
    gen = Generator(models, cfg, data_parser=VideoDataParser(cfg["data"]))

    def fake_depth(frames, latent_hw):
        lh, lw = latent_hw
        d = frames.mean(axis=-1, keepdims=True)
        d = np.stack([
            np.array(jnp.asarray(d[i, ::d.shape[1] // lh, ::d.shape[2] // lw]))
            for i in range(len(frames))
        ])[:, :lh, :lw]
        return jnp.asarray(2.0 * d - 1.0)

    gen.depth_fn = fake_depth
    out = gen(None, str(tmp_path / "out_depth"), list(range(4)))
    arr = np.asarray(next(iter(out.values())))
    assert np.isfinite(arr).all()
    # depth cache written
    assert list((tmp_path / "out_depth" / "depth").glob("*.npy"))
