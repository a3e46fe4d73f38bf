"""ControlNet (SD1.5 family) in Flax.

Rebuild of diffusers `ControlNetModel` as the reference uses it: built per
control type in init_model (utils/VidToMe/utils.py:49-55) and run inside
pred_noise to produce additive residuals for the UNet
(get_controlnet_kwargs, utils/VidToMe/utils.py:312-326; applied at
generate_utils.py:267-272).

Architecture = the SD UNet's down + mid stack (identical module names, so
the converter reuses convert_unet's path rules) + a conditioning embedder
that maps the full-res control image to latent resolution + zero-init 1x1
"zero convs" on every skip and the mid output. Injection happens in
`UNet2DCondition.__call__(down_residuals=..., mid_residual=...)`: each of
the 12 down residuals is added to the corresponding skip, the mid residual
after the mid block — matching diffusers' semantics exactly.

No token merging inside ControlNet: the reference patches only the UNet
(vidtome apply_patch walks pipe.unet), so the control branch runs plain
per-frame attention here too.
"""

from __future__ import annotations

import re
from typing import Any, Mapping, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.layers import (
    Downsample2D,
    ResnetBlock2D,
    TimestepEmbedding,
    timestep_embedding,
)
from tclight_tpu.models.unet import Transformer2D, UNetConfig

Dtype = Any

# diffusers ControlNetConditioningEmbedding channel plan
_COND_EMBED_CHANNELS = (16, 32, 96, 256)


class ControlNetCondEmbedding(nn.Module):
    """Control image (B, H, W, 3) -> latent-res feature (B, H/8, W/8, ch0).
    diffusers ControlNetConditioningEmbedding: conv_in -> 3 stride-2 channel
    jumps -> zero conv_out."""

    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        chans = _COND_EMBED_CHANNELS
        h = nn.Conv(chans[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(chans) - 1):
            h = nn.Conv(chans[i], (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
            h = nn.Conv(chans[i + 1], (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"blocks_{2 * i + 1}")(h)
            h = nn.silu(h)
        # zero-initialized: at init the control branch is a no-op
        return nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv_out")(h)


class ControlNetModel(nn.Module):
    """SD down+mid stack emitting zero-conv residuals.

    __call__(x (B,Hl,Wl,Cin), t, context (B,S,ctx), cond_image (B,H,W,3))
    -> (down_residuals: list of 12, mid_residual)."""

    config: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, context, cond_image):
        cfg = self.config
        ch = cfg.block_out_channels
        n_levels = len(ch)
        has_attn = [i < n_levels - 1 for i in range(n_levels)]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        temb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=cfg.dtype,
                                 name="time_embedding")(temb)

        h = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(x)
        h = h + ControlNetCondEmbedding(
            ch[0], dtype=cfg.dtype, name="controlnet_cond_embedding",
        )(cond_image.astype(cfg.dtype))
        skips = [h]

        for lvl in range(n_levels):
            for blk in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch[lvl], dtype=cfg.dtype,
                                  groups=cfg.norm_groups,
                                  name=f"down_{lvl}_res_{blk}")(h, temb)
                if has_attn[lvl]:
                    h, _ = Transformer2D(
                        ch[lvl], cfg.num_heads, cfg.context_dim,
                        cfg.norm_groups, None, dtype=cfg.dtype,
                        name=f"down_{lvl}_attn_{blk}",
                    )(h, context, False, None, None, None, False)
                skips.append(h)
            if lvl < n_levels - 1:
                h = Downsample2D(ch[lvl], dtype=cfg.dtype,
                                 name=f"down_{lvl}_ds")(h)
                skips.append(h)

        h = ResnetBlock2D(ch[-1], dtype=cfg.dtype, groups=cfg.norm_groups,
                          name="mid_res_0")(h, temb)
        h, _ = Transformer2D(
            ch[-1], cfg.num_heads, cfg.context_dim, cfg.norm_groups, None,
            dtype=cfg.dtype, name="mid_attn",
        )(h, context, False, None, None, None, False)
        h = ResnetBlock2D(ch[-1], dtype=cfg.dtype, groups=cfg.norm_groups,
                          name="mid_res_1")(h, temb)

        down_residuals = [
            nn.Conv(s.shape[-1], (1, 1), kernel_init=nn.initializers.zeros,
                    dtype=cfg.dtype, name=f"controlnet_down_{i}")(s)
            for i, s in enumerate(skips)
        ]
        mid_residual = nn.Conv(
            ch[-1], (1, 1), kernel_init=nn.initializers.zeros,
            dtype=cfg.dtype, name="controlnet_mid")(h)
        return down_residuals, mid_residual


def convert_controlnet(sd: Mapping[str, np.ndarray], n_levels: int = 4) -> dict:
    """diffusers ControlNetModel (control_v11* checkpoints) -> params.

    The shared down/mid trunk reuses convert_unet's key mapping; the
    controlnet-specific heads (cond embedding + zero convs) map here."""
    from tclight_tpu.models.convert import convert_unet

    trunk = {}
    extra = {}
    for k, v in sd.items():
        if k.startswith(("controlnet_cond_embedding.", "controlnet_down_blocks.",
                         "controlnet_mid_block.")):
            extra[k] = v
        else:
            trunk[k] = v
    params = convert_unet(trunk, n_levels=n_levels)["params"]

    def conv_t(w):
        return np.transpose(np.asarray(w), (2, 3, 1, 0))

    def put(path, val):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(val)

    for k, v in extra.items():
        m = re.fullmatch(
            r"controlnet_cond_embedding\.(conv_in|conv_out|blocks\.\d+)\.(weight|bias)", k)
        if m:
            name = m.group(1).replace("blocks.", "blocks_")
            val = conv_t(v) if m.group(2) == "weight" else v
            put(f"controlnet_cond_embedding/{name}/"
                f"{'kernel' if m.group(2) == 'weight' else 'bias'}", val)
            continue
        m = re.fullmatch(r"controlnet_down_blocks\.(\d+)\.(weight|bias)", k)
        if m:
            val = conv_t(v) if m.group(2) == "weight" else v
            put(f"controlnet_down_{m.group(1)}/"
                f"{'kernel' if m.group(2) == 'weight' else 'bias'}", val)
            continue
        m = re.fullmatch(r"controlnet_mid_block\.(weight|bias)", k)
        if m:
            val = conv_t(v) if m.group(1) == "weight" else v
            put(f"controlnet_mid/"
                f"{'kernel' if m.group(1) == 'weight' else 'bias'}", val)
            continue
        raise KeyError(f"unmatched controlnet key {k}")
    return {"params": params}


def load_controlnet(ckpt_path, config: Optional[UNetConfig] = None):
    """(model, params) from a local control_v11* checkpoint file."""
    from tclight_tpu.models.convert import load_torch_state_dict

    cfg = config or UNetConfig.sd15(in_channels=4)
    return ControlNetModel(cfg), convert_controlnet(load_torch_state_dict(ckpt_path))
