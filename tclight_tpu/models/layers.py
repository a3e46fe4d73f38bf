"""Shared Flax building blocks for the diffusion models (NHWC, TPU layout).

Functional equivalents of the diffusers layers the reference pipeline relies
on (resnet blocks, up/downsampling, timestep embeddings, GEGLU feed-forward)
— written fresh in flax.linen with NHWC convolutions, bf16-friendly compute,
and no module surgery.
"""

from __future__ import annotations

import math

import jax
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding (diffusers Timesteps semantics: SD uses
    flip_sin_to_cos=True, shift=0). timesteps: (B,) -> (B, dim)."""
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """2-layer MLP lifting the sinusoidal embedding to time_embed_dim."""

    time_embed_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_1")(sample)
        x = nn.silu(x)
        return nn.Dense(self.time_embed_dim, dtype=self.dtype, name="linear_2")(x)


class ResnetBlock2D(nn.Module):
    """GroupNorm-SiLU-Conv resnet block with timestep conditioning."""

    out_channels: int
    dtype: Dtype = jnp.float32
    groups: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: jnp.ndarray) -> jnp.ndarray:
        residual = x
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv1",
        )(h)
        t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
            nn.silu(temb)
        )
        h = h + t[:, None, None, :]
        h = nn.GroupNorm(self.groups, epsilon=1e-5, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv2",
        )(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class Downsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # stride-2 conv with asymmetric (0,1) padding, matching SD
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2),
            padding=((0, 1), (0, 1)), dtype=self.dtype, name="conv",
        )(x)


class Upsample2D(nn.Module):
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, out_size: tuple | None = None) -> jnp.ndarray:
        b, h, w, c = x.shape
        th, tw = out_size if out_size is not None else (2 * h, 2 * w)
        if (th, tw) == (2 * h, 2 * w):
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
        else:
            # odd-sized skip (latent dims not divisible by 2^levels):
            # nearest-resize to the skip's exact size, as diffusers does via
            # `upsample_size`
            x = jax.image.resize(x, (b, th, tw, c), method="nearest")
        return nn.Conv(
            self.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv",
        )(x)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """GEGLU feed-forward (mult=4), as in SD transformer blocks."""

    dim: int
    mult: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = GEGLU(self.dim * self.mult, dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)
