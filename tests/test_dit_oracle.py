"""GeneralDIT checkpoint-fidelity parity vs the reference torch modules.

Builds the reference GeneralDIT / VideoExtendGeneralDIT
(cosmos1/models/diffusion/networks/general_dit.py,
general_dit_video_conditioned.py) on CPU with TransformerEngine replaced
by a behavioral stub (tests/_te_stub.py), random-initializes it, converts
the state dict with `convert_general_dit`, and compares forward outputs —
the proof that real Cosmos-1.0 diffusion checkpoints load losslessly."""

from __future__ import annotations

import numpy as np
import pytest
import torch

from _ref_oracle import ref_import
from _te_stub import install_te_stub

import jax
import jax.numpy as jnp

from tclight_tpu.cosmos.convert_dit import convert_general_dit
from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT

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
    rope_t_extrapolation_ratio=2.0,
)


def _tiny_cfg(**over) -> DiTConfig:
    base = dict(
        in_channels=TINY["in_channels"], out_channels=TINY["out_channels"],
        model_channels=TINY["model_channels"], num_blocks=TINY["num_blocks"],
        num_heads=TINY["num_heads"], context_dim=TINY["crossattn_emb_channels"],
        patch_spatial=TINY["patch_spatial"],
        patch_temporal=TINY["patch_temporal"],
        max_frames=TINY["max_frames"], max_img_h=TINY["max_img_h"],
        max_img_w=TINY["max_img_w"], adaln_lora_dim=TINY["adaln_lora_dim"],
        rope_t_extrapolation_ratio=TINY["rope_t_extrapolation_ratio"],
    )
    base.update(over)
    return DiTConfig(**base)


def _state_dict_np(model) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}


def _run_pair(ref_model, cfg: DiTConfig, b=2, t=4, h=16, w=16,
              extra_torch=None, extra_jax=None, data_channels=None):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    c_in = data_channels or cfg.in_channels
    x = rng.standard_normal((b, c_in, t, h, w)).astype(np.float32)
    ts = np.asarray([3.0, 11.0])[:b].astype(np.float32)
    ctx = rng.standard_normal((b, 7, cfg.context_dim)).astype(np.float32)
    pad = np.zeros((b, 1, h, w), np.float32)
    pad[:, :, -2:, :] = 1.0

    with torch.no_grad():
        out_t = ref_model(
            torch.from_numpy(x), torch.from_numpy(ts),
            torch.from_numpy(ctx), padding_mask=torch.from_numpy(pad),
            fps=torch.full((b,), 24.0),
            **(extra_torch or {}),
        ).numpy()

    params = convert_general_dit(_state_dict_np(ref_model))
    model = GeneralDIT(cfg)
    out_j = model.apply(
        params, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), jnp.asarray(ts),
        jnp.asarray(ctx), padding_mask=jnp.asarray(pad[:, 0]),
        **(extra_jax or {}),
    )
    out_j = np.asarray(out_j).transpose(0, 4, 1, 2, 3)
    assert out_t.shape == out_j.shape
    np.testing.assert_allclose(out_j, out_t, rtol=2e-4, atol=2e-4)
    return out_t


def test_general_dit_forward_matches_reference():
    install_te_stub()
    ref_mod = ref_import("cosmos1.models.diffusion.networks.general_dit")
    torch.manual_seed(7)
    ref_model = ref_mod.GeneralDIT(**TINY).eval()
    # break the zero-init adaLN symmetry so modulation paths are exercised
    with torch.no_grad():
        for name, p in ref_model.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)
    out = _run_pair(ref_model, _tiny_cfg())
    assert np.isfinite(out).all() and np.abs(out).max() > 0


def test_general_dit_no_lora_no_extras_matches_reference():
    install_te_stub()
    ref_mod = ref_import("cosmos1.models.diffusion.networks.general_dit")
    kwargs = dict(TINY, use_adaln_lora=False, extra_per_block_abs_pos_emb=False,
                  affline_emb_norm=False)
    torch.manual_seed(3)
    ref_model = ref_mod.GeneralDIT(**kwargs).eval()
    with torch.no_grad():
        for _, p in ref_model.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)
    _run_pair(ref_model, _tiny_cfg(use_adaln_lora=False,
                                   extra_per_block_abs_pos_emb=False,
                                   affline_emb_norm=False))


def test_video_extend_dit_matches_reference():
    install_te_stub()
    ref_mod = ref_import(
        "cosmos1.models.diffusion.networks.general_dit_video_conditioned")
    kwargs = dict(TINY)
    kwargs.pop("in_channels")
    torch.manual_seed(5)
    ref_model = ref_mod.VideoExtendGeneralDIT(
        in_channels=4 + 1, **kwargs).eval()
    with torch.no_grad():
        for _, p in ref_model.named_parameters():
            if p.abs().sum() == 0:
                p.add_(torch.randn_like(p) * 0.02)

    b, t, h, w = 2, 4, 16, 16
    cond_mask = np.zeros((b, 1, t, h, w), np.float32)
    cond_mask[:, :, :1] = 1.0  # condition on the first frame
    cfg = _tiny_cfg(in_channels=5)
    _run_pair(
        ref_model, cfg, b=b, t=t, h=h, w=w, data_channels=4,
        extra_torch=dict(
            condition_video_input_mask=torch.from_numpy(cond_mask)),
        extra_jax=dict(
            condition_video_input_mask=jnp.asarray(
                cond_mask.transpose(0, 2, 3, 4, 1))),
    )


def test_rope_angles_match_reference_embeddings():
    """VideoRopePosition3DEmb parity: the reference emits per-position
    rotate-half angle vectors (L, 1, 1, head_dim); ours must match."""
    install_te_stub()
    ref_pe = ref_import("cosmos1.models.diffusion.module.position_embedding")
    from tclight_tpu.cosmos.dit import video_rope_angles

    head_dim, t, h, w = 24, 3, 8, 8
    emb = ref_pe.VideoRopePosition3DEmb(
        head_dim=head_dim, len_h=8, len_w=8, len_t=4,
        h_extrapolation_ratio=2.0, w_extrapolation_ratio=1.0,
        t_extrapolation_ratio=2.0)
    ref = emb.generate_embeddings(torch.Size((1, t, h, w, 1)),
                                  fps=torch.tensor([24.0])).numpy()
    ours = video_rope_angles(head_dim, t, h, w, h_ratio=2.0, w_ratio=1.0,
                             t_ratio=2.0)
    np.testing.assert_allclose(ours, ref.reshape(t * h * w, head_dim),
                               rtol=1e-5, atol=1e-6)
