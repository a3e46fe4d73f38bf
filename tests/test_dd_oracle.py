"""Diffusion-decoder checkpoint-fidelity parity vs the reference torch
modules (cosmos1/models/autoregressive/diffusion_decoder/): the
token-conditioned DiffusionDecoderGeneralDIT forward, the chunk/blend
utils, and the chunked process_tokens orchestration."""

from __future__ import annotations

import numpy as np
import pytest
import torch

from _ref_oracle import ref_import
from _te_stub import install_te_stub

import jax.numpy as jnp

from tclight_tpu.cosmos.convert_dit import convert_diffusion_decoder_dit
from tclight_tpu.cosmos.diffusion_decoder import (
    DiffusionDecoderGeneralDIT, DiffusionDecoderSamplingConfig,
    build_tiny_decoder, diffusion_decoder_process_tokens,
    linear_blend_video_list, split_with_overlap)
from tclight_tpu.cosmos.dit import DiTConfig

TINY = dict(
    max_img_h=16, max_img_w=16, max_frames=4,
    in_channels=4, out_channels=4,
    patch_spatial=2, patch_temporal=1,
    model_channels=64, num_blocks=2, num_heads=4,
    crossattn_emb_channels=32,
    pos_emb_cls="rope3d", block_x_format="THWBD",
    affline_emb_norm=True, use_adaln_lora=True, adaln_lora_dim=16,
    extra_per_block_abs_pos_emb=True,
    extra_per_block_abs_pos_emb_type="learnable",
    is_diffusion_decoder=True,
    diffusion_decoder_condition_on_sigma=False,
    diffusion_decoder_condition_on_token=True,
    diffusion_decoder_token_condition_voc_size=64,
    diffusion_decoder_token_condition_dim=8,
)


def test_diffusion_decoder_dit_matches_reference():
    install_te_stub()
    ref_mod = ref_import(
        "cosmos1.models.autoregressive.diffusion_decoder.network")
    torch.manual_seed(11)
    ref_model = ref_mod.DiffusionDecoderGeneralDIT(**TINY).eval()
    with torch.no_grad():
        for _, p in ref_model.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    b, t, h, w = 2, 4, 16, 16
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, 4, t, h, w)).astype(np.float32)
    ts = np.asarray([3.0, 11.0], np.float32)
    ctx = rng.standard_normal((b, 7, 32)).astype(np.float32)
    pad = np.zeros((b, 1, h, w), np.float32)
    pad[:, :, -2:, :] = 1.0
    # tokens at the discrete tokenizer's coarser spatial grid (H/2, W/2
    # here; the real 8x16x16-vs-8x8x8 ratio is also 2x)
    tokens = rng.integers(0, 64, (b, 1, t, h // 2, w // 2))

    with torch.no_grad():
        out_t = ref_model(
            torch.from_numpy(x), torch.from_numpy(ts),
            torch.from_numpy(ctx), padding_mask=torch.from_numpy(pad),
            fps=torch.full((b,), 24.0),
            latent_condition=torch.from_numpy(tokens),
        ).numpy()

    sd = {k: v.detach().cpu().numpy()
          for k, v in ref_model.state_dict().items()}
    params = convert_diffusion_decoder_dit(sd)
    cfg = DiTConfig(
        in_channels=4, out_channels=4, model_channels=64, num_blocks=2,
        num_heads=4, context_dim=32, patch_spatial=2, patch_temporal=1,
        max_frames=4, max_img_h=16, max_img_w=16, adaln_lora_dim=16)
    model = DiffusionDecoderGeneralDIT(cfg, token_vocab=64, token_dim=8)
    out_j = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), jnp.asarray(ts),
        jnp.asarray(ctx), padding_mask=jnp.asarray(pad[:, 0]),
        latent_condition=jnp.asarray(tokens[:, 0], jnp.int32))
    out_j = np.asarray(out_j).transpose(0, 4, 1, 2, 3)
    assert out_t.shape == out_j.shape
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-4)


def test_split_with_overlap_matches_reference():
    ref_utils = ref_import(
        "cosmos1.models.autoregressive.diffusion_decoder.utils")
    rng = np.random.default_rng(1)
    v = rng.standard_normal((1, 3, 13, 4, 4)).astype(np.float32)
    ours = split_with_overlap(v, 5, overlap=2)
    theirs = ref_utils.split_with_overlap(torch.from_numpy(v), 5, overlap=2,
                                          tobf16=False)
    assert len(ours) == len(theirs)
    for a, b in zip(ours, theirs):
        np.testing.assert_allclose(a, b.numpy(), rtol=1e-6, atol=1e-6)


def test_linear_blend_matches_reference():
    ref_utils = ref_import(
        "cosmos1.models.autoregressive.diffusion_decoder.utils")
    rng = np.random.default_rng(2)
    vids = [rng.standard_normal((1, 3, 8, 4, 4)).astype(np.float32)
            for _ in range(3)]
    ours = linear_blend_video_list(vids, 2)
    theirs = ref_utils.linear_blend_video_list(
        [torch.from_numpy(v) for v in vids], 2).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_process_tokens_chunked_generation():
    """inference.py:28-120 orchestration on a tiny decoder: two overlapping
    latent chunks -> two generations -> pixel blend of the right length."""
    dec = build_tiny_decoder()
    cfg = DiffusionDecoderSamplingConfig(
        dd_train_num_video_frames=25, overlap=1, num_steps=3,
        continuous_tokenizer_channel=4,
        continuous_tokenizer_spatial_compression_ratio=2)
    # token stream longer than one chunk: latent_t = 4, T' = 6 -> 2 chunks
    rng = np.random.default_rng(3)
    tokens = rng.integers(0, 64, (6, 4, 4)).astype(np.int32)

    def decode_fn(latents):  # (B,T,H,W,C) -> (B,C,8T,2H,2W) in [-1,1]
        lat = np.asarray(latents)
        b, t, h, w, c = lat.shape
        up = np.repeat(np.repeat(np.repeat(lat, 8, 1), 2, 2), 2, 3)
        return np.tanh(up.transpose(0, 4, 1, 2, 3)[:, :3])

    out = diffusion_decoder_process_tokens(
        dec, [tokens], decode_fn, video_height=8, video_width=8,
        dd_sampling_config=cfg, context_dim=32)
    assert len(out) == 1
    c, tp, hp, wp = out[0].shape
    # 2 chunks x 32 pixel frames, blended over 8 overlap frames
    assert (c, tp, hp, wp) == (3, 2 * 32 - 8, 8, 8)
    assert np.isfinite(out[0]).all()
    assert out[0].min() >= 0.0 and out[0].max() <= 1.0
