"""Checkpoint conversion: bijection checks on synthetic diffusers-style
state dicts + true numerics parity vs torch modules."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.convert import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    expand_conv_in,
    merge_offsets,
)
from tclight_tpu.models.unet import UNet2DCondition, UNetConfig
from tclight_tpu.models.vae import AutoencoderKL, VAEConfig
from tclight_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig


# --------------------------------------------------------- inverse mappings


def _unconv(w):  # HWIO -> OIHW
    return np.transpose(np.asarray(w), (3, 2, 0, 1))


def _unlin(w):
    return np.transpose(np.asarray(w))


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _attn_torch_keys(prefix, sub, leaf, val):
    """Invert our Transformer2D naming to diffusers keys."""
    if sub == "norm":
        return f"{prefix}.norm.{'weight' if leaf == 'scale' else 'bias'}", val
    if sub in ("proj_in", "proj_out"):
        if leaf == "kernel":
            return f"{prefix}.{sub}.weight", _unconv(val)
        return f"{prefix}.{sub}.bias", val
    raise KeyError(sub)


def flax_to_torch_unet(params, n_levels):
    """Walk our flax UNet params -> synthetic diffusers state dict."""
    flat = _flatten(params["params"])
    sd = {}
    import re

    for path, val in flat.items():
        parts = path.split("/")
        name = parts[0]
        m = re.fullmatch(r"down_(\d+)_res_(\d+)", name)
        if m:
            prefix = f"down_blocks.{m.group(1)}.resnets.{m.group(2)}"
        elif re.fullmatch(r"up_(\d+)_res_(\d+)", name):
            lvl, j = re.findall(r"\d+", name)
            prefix = f"up_blocks.{n_levels - 1 - int(lvl)}.resnets.{j}"
        elif re.fullmatch(r"mid_res_(\d+)", name):
            prefix = f"mid_block.resnets.{name[-1]}"
        elif re.fullmatch(r"down_(\d+)_attn_(\d+)", name):
            lvl, j = re.findall(r"\d+", name)
            prefix = f"down_blocks.{lvl}.attentions.{j}"
        elif re.fullmatch(r"up_(\d+)_attn_(\d+)", name):
            lvl, j = re.findall(r"\d+", name)
            prefix = f"up_blocks.{n_levels - 1 - int(lvl)}.attentions.{j}"
        elif name == "mid_attn":
            prefix = "mid_block.attentions.0"
        elif re.fullmatch(r"down_(\d+)_ds", name):
            lvl = re.findall(r"\d+", name)[0]
            prefix = f"down_blocks.{lvl}.downsamplers.0"
        elif re.fullmatch(r"up_(\d+)_us", name):
            lvl = re.findall(r"\d+", name)[0]
            prefix = f"up_blocks.{n_levels - 1 - int(lvl)}.upsamplers.0"
        else:
            prefix = name  # conv_in / conv_out / conv_norm_out / time_embedding

        rest, leaf = parts[1:-1], parts[-1]
        if name in ("conv_in", "conv_out"):
            key = f"{name}.weight" if leaf == "kernel" else f"{name}.bias"
            sd[key] = _unconv(val) if leaf == "kernel" else val
        elif name == "conv_norm_out":
            sd[f"conv_norm_out.{'weight' if leaf == 'scale' else 'bias'}"] = val
        elif name == "time_embedding":
            lin = rest[0]
            key = f"time_embedding.{lin}.{'weight' if leaf == 'kernel' else 'bias'}"
            sd[key] = _unlin(val) if leaf == "kernel" else val
        elif "res" in name:
            part = rest[0]
            if part.startswith("norm"):
                sd[f"{prefix}.{part}.{'weight' if leaf == 'scale' else 'bias'}"] = val
            elif part in ("conv1", "conv2", "conv_shortcut"):
                sd[f"{prefix}.{part}.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                    _unconv(val) if leaf == "kernel" else val)
            else:  # time_emb_proj
                sd[f"{prefix}.{part}.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                    _unlin(val) if leaf == "kernel" else val)
        elif "_ds" in name or "_us" in name:
            sd[f"{prefix}.conv.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                _unconv(val) if leaf == "kernel" else val)
        else:  # attention blocks
            sub = rest[0]
            if sub in ("norm", "proj_in", "proj_out"):
                key, v = _attn_torch_keys(prefix, sub, leaf, val)
                sd[key] = v
            else:  # transformer_blocks_0
                inner = rest[1]
                tb = f"{prefix}.transformer_blocks.0"
                if inner.startswith("norm"):
                    sd[f"{tb}.{inner}.{'weight' if leaf == 'scale' else 'bias'}"] = val
                elif inner in ("attn1", "attn2"):
                    proj = rest[2]
                    torch_proj = "to_out.0" if proj == "to_out_0" else proj
                    key = f"{tb}.{inner}.{torch_proj}.{'weight' if leaf == 'kernel' else 'bias'}"
                    sd[key] = _unlin(val) if leaf == "kernel" else val
                else:  # ff
                    if rest[2] == "net_0":
                        key = f"{tb}.ff.net.0.proj.{'weight' if leaf == 'kernel' else 'bias'}"
                    else:
                        key = f"{tb}.ff.net.2.{'weight' if leaf == 'kernel' else 'bias'}"
                    sd[key] = _unlin(val) if leaf == "kernel" else val
    return sd


@pytest.mark.slow
def test_unet_conversion_bijection():
    cfg = UNetConfig.tiny(in_channels=8)
    model = UNet2DCondition(cfg)
    x = jnp.zeros((1, 16, 16, 8))
    ctx = jnp.zeros((1, 77, cfg.context_dim))
    params = model.init(jax.random.PRNGKey(0), x, jnp.asarray(1.0), ctx)
    sd = flax_to_torch_unet(params, n_levels=len(cfg.block_out_channels))
    converted = convert_unet(sd, n_levels=len(cfg.block_out_channels))
    flat_a = _flatten(jax.tree.map(np.asarray, params["params"]))
    flat_b = _flatten(converted["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], atol=0, err_msg=k)
    # converted params must actually run
    out, _ = model.apply(converted, x, jnp.asarray(1.0), ctx)
    assert out.shape == (1, 16, 16, 4)


def test_expand_conv_in_and_offsets():
    sd = {"conv_in.weight": np.ones((8, 4, 3, 3), np.float32),
          "other.weight": np.full((2, 2), 2.0, np.float32)}
    wide = expand_conv_in(sd, 8)
    assert wide["conv_in.weight"].shape == (8, 8, 3, 3)
    np.testing.assert_allclose(wide["conv_in.weight"][:, :4], 1.0)
    np.testing.assert_allclose(wide["conv_in.weight"][:, 4:], 0.0)
    offsets = {"conv_in.weight": np.full((8, 8, 3, 3), 0.5, np.float32)}
    merged = merge_offsets(wide, offsets)
    np.testing.assert_allclose(merged["conv_in.weight"][:, :4], 1.5)
    np.testing.assert_allclose(merged["conv_in.weight"][:, 4:], 0.5)
    np.testing.assert_allclose(merged["other.weight"], 2.0)


def test_clip_text_parity_with_transformers():
    """Full numerics parity vs a real torch CLIPTextModel (tiny config)."""
    import torch
    from transformers import CLIPTextConfig as HFConfig, CLIPTextModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = HFModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_clip_text(sd)

    cfg = CLIPTextConfig(vocab_size=100, hidden_size=32, num_layers=2,
                         num_heads=2, intermediate_size=64)
    model = CLIPTextModel(cfg)
    ids = np.random.default_rng(0).integers(0, 100, (2, 12))
    with torch.no_grad():
        ref = hf(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(ids)))
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_conv_padding_parity_with_torch(rng):
    """Our stride-2 (0,1)-padded NHWC conv == torch's SD downsample conv."""
    import torch

    w = rng.standard_normal((8, 4, 3, 3)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float32)
    x = rng.standard_normal((1, 4, 9, 9)).astype(np.float32)
    conv = torch.nn.Conv2d(4, 8, 3, stride=2, padding=0)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w))
        conv.bias.copy_(torch.from_numpy(b))
        ref = conv(torch.nn.functional.pad(torch.from_numpy(x), (0, 1, 0, 1))).numpy()

    import flax.linen as nn

    layer = nn.Conv(8, (3, 3), strides=(2, 2), padding=((0, 1), (0, 1)))
    params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                         "bias": jnp.asarray(b)}}
    ours = layer.apply(params, jnp.asarray(np.moveaxis(x, 1, -1)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               atol=1e-5, rtol=1e-4)
