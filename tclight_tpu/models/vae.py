"""AutoencoderKL (SD VAE) in Flax, NHWC.

Rebuild of the diffusers VAE the reference uses for latent encode/decode
(loaded at utils/model_utils.py:15, batched encode/decode at
utils/VidToMe/generate_utils.py:140-172). Scaling factor 0.18215 is applied
by the pipeline, not the model. Encode returns the diagonal-Gaussian
moments; `sample`/`mode` helpers mirror the reference's usage (the
reference samples the posterior for concat_conds and uses .mode() nowhere
on the hot path — we default to deterministic mode() for reproducibility,
with sampling available).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    latent_channels: int = 4
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    scaling_factor: float = 0.18215
    dtype: Any = jnp.float32

    @staticmethod
    def sd15(dtype=jnp.bfloat16) -> "VAEConfig":
        return VAEConfig(dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "VAEConfig":
        return VAEConfig(
            block_out_channels=(16, 32), layers_per_block=1, norm_groups=8,
            dtype=dtype,
        )


class VAEResnet(nn.Module):
    out_channels: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv1")(h)
        h = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return h + residual


class VAEAttention(nn.Module):
    """Single-head self-attention over spatial positions (VAE mid block)."""

    channels: int
    groups: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        z = nn.GroupNorm(self.groups, epsilon=1e-6, dtype=self.dtype,
                         name="group_norm")(x)
        z = z.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(z)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(z)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(z)
        logits = jnp.einsum("bqc,bkc->bqk", q, k,
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits / jnp.sqrt(c), axis=-1).astype(self.dtype)
        z = jnp.einsum("bqk,bkc->bqc", probs, v)
        z = nn.Dense(c, dtype=self.dtype, name="to_out_0")(z)
        return z.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        ch = cfg.block_out_channels
        h = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(x)
        for lvl in range(len(ch)):
            for blk in range(cfg.layers_per_block):
                h = VAEResnet(ch[lvl], cfg.norm_groups, cfg.dtype,
                              name=f"down_{lvl}_res_{blk}")(h)
            if lvl < len(ch) - 1:
                h = nn.Conv(ch[lvl], (3, 3), strides=(2, 2),
                            padding=((0, 1), (0, 1)), dtype=cfg.dtype,
                            name=f"down_{lvl}_ds")(h)
        h = VAEResnet(ch[-1], cfg.norm_groups, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(ch[-1], cfg.norm_groups, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(ch[-1], cfg.norm_groups, cfg.dtype, name="mid_res_1")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                       name="quant_conv")(h)


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        ch = cfg.block_out_channels
        h = nn.Conv(cfg.latent_channels, (1, 1), dtype=cfg.dtype,
                    name="post_quant_conv")(z)
        h = nn.Conv(ch[-1], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(h)
        h = VAEResnet(ch[-1], cfg.norm_groups, cfg.dtype, name="mid_res_0")(h)
        h = VAEAttention(ch[-1], cfg.norm_groups, cfg.dtype, name="mid_attn")(h)
        h = VAEResnet(ch[-1], cfg.norm_groups, cfg.dtype, name="mid_res_1")(h)
        for i, lvl in enumerate(reversed(range(len(ch)))):
            for blk in range(cfg.layers_per_block + 1):
                h = VAEResnet(ch[lvl], cfg.norm_groups, cfg.dtype,
                              name=f"up_{lvl}_res_{blk}")(h)
            if lvl > 0:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = nn.Conv(ch[lvl], (3, 3), padding=((1, 1), (1, 1)),
                            dtype=cfg.dtype, name=f"up_{lvl}_us")(h)
        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-6, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.in_channels, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=cfg.dtype, name="conv_out")(h).astype(jnp.float32)


class AutoencoderKL(nn.Module):
    """encode(x) -> (mean, logvar); decode(z) -> image. Images in [-1, 1],
    NHWC."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config)
        self.decoder = Decoder(self.config)

    def encode(self, x):
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean.astype(jnp.float32), jnp.clip(logvar, -30.0, 20.0).astype(jnp.float32)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x, rng=None, sample: bool = False):
        mean, logvar = self.encode(x)
        if sample:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        else:
            z = mean
        return self.decode(z), mean, logvar
