"""Continuous (CV) video tokenizer wrappers for the diffusion pipelines.

Rebuild of cosmos1/models/diffusion/module/pretrained_vae.py:

- `CausalContinuousVideoTokenizer` — the CV-family network (the reference
  ships it only as an opaque torch.jit blob; we instantiate the same
  factorized causal encoder/decoder stack as the DV tokenizer,
  tokenizer/modules.py, with a continuous 16-channel latent instead of
  FSQ codes).
- `VideoTokenizer` — the temporal-causal chunked inference wrapper
  (BasePretrainedVideoTokenizer + VideoJITTokenizer,
  pretrained_vae.py:314-530): T splits into `pixel_chunk_duration`-frame
  causal chunks, each encoded/decoded independently with device batches
  capped, plus the latent mean/std normalization JITVAE applies
  (pretrained_vae.py:127-151). `temporal_compression_factor == 1`
  degenerates to the per-frame image path (pretrained_vae.py:380-382).

Layout is channel-last (B, T, H, W, C) like the rest of the repo.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.cosmos.dv_tokenizer import (
    CausalConv3d,
    DecoderFactorized,
    DVTokenizerConfig,
    EncoderFactorized,
)

__all__ = ["CausalContinuousVideoTokenizer", "VideoTokenizer",
           "cv_config_8x8x8"]


def cv_config_8x8x8(**overrides) -> DVTokenizerConfig:
    """CV8x8x8 layout: 16-ch continuous latent, 8x spatial / 8x temporal
    compression (the Cosmos-1.0-Tokenizer-CV8x8x8 contract the diffusion
    configs assume; the reference loads it as a JIT blob)."""
    base = dict(channels=128, channels_mult=(2, 4, 4), num_res_blocks=2,
                attn_resolutions=(32,), resolution=1024, patch_size=2,
                z_channels=16, embedding_dim=16,
                spatial_compression=8, temporal_compression=8)
    base.update(overrides)
    return DVTokenizerConfig(**base)


class CausalContinuousVideoTokenizer(nn.Module):
    """Continuous-latent sibling of `CausalDiscreteVideoTokenizer`: same
    factorized causal encoder/decoder, a 1x1x1 conv pair in place of the
    FSQ quantizer. encode: (B, T, H, W, 3) -> (B, t, h, w, latent_ch)."""

    cfg: DVTokenizerConfig

    def setup(self):
        cfg = self.cfg
        self.encoder = EncoderFactorized(
            cfg, z_channels=cfg.z_factor * cfg.z_channels, name="encoder")
        self.decoder = DecoderFactorized(
            cfg, z_channels=cfg.z_channels, name="decoder")
        self.quant_conv = CausalConv3d(
            cfg.embedding_dim, (1, 1, 1), padding=0, dtype=cfg.dtype,
            name="quant_conv")
        self.post_quant_conv = CausalConv3d(
            cfg.z_channels, (1, 1, 1), padding=0, dtype=cfg.dtype,
            name="post_quant_conv")

    def encode(self, x):
        return self.quant_conv(self.encoder(x))

    def decode(self, latent):
        return self.decoder(self.post_quant_conv(latent))

    def __call__(self, x):
        z = self.encode(x)
        return self.decode(z), z


@dataclasses.dataclass
class VideoTokenizer:
    """Chunked, normalized encode/decode around jitted apply fns.

    encode: pixels -> (encoder(x) - latent_mean) / latent_std, per causal
    pixel chunk; decode inverts. `latent_mean`/`latent_std` default to
    0/1 (the reference loads them from mean_std.pt; the converter can
    install real values)."""

    module: Any                      # CausalContinuousVideoTokenizer
    params: Any
    pixel_chunk_duration: int = 17
    temporal_compression_factor: int = 8
    max_enc_batch_size: int = 8
    max_dec_batch_size: int = 4
    latent_mean: Any = 0.0           # broadcastable to (.., latent_ch)
    latent_std: Any = 1.0

    def __post_init__(self):
        mod = self.module
        self._enc = jax.jit(lambda p, v: mod.apply(
            p, v, method=type(mod).encode))
        self._dec = jax.jit(lambda p, z: mod.apply(
            p, z, method=type(mod).decode))

    @property
    def latent_ch(self) -> int:
        return self.module.cfg.embedding_dim

    @property
    def latent_chunk_duration(self) -> int:
        assert (self.pixel_chunk_duration - 1) % \
            self.temporal_compression_factor == 0
        return (self.pixel_chunk_duration - 1) // \
            self.temporal_compression_factor + 1

    def get_latent_num_frames(self, num_pixel_frames: int) -> int:
        if num_pixel_frames == 1:
            return 1
        assert num_pixel_frames % self.pixel_chunk_duration == 0
        return (num_pixel_frames // self.pixel_chunk_duration
                * self.latent_chunk_duration)

    def get_pixel_num_frames(self, num_latent_frames: int) -> int:
        if num_latent_frames == 1:
            return 1
        assert num_latent_frames % self.latent_chunk_duration == 0
        return (num_latent_frames // self.latent_chunk_duration
                * self.pixel_chunk_duration)

    def _batched(self, fn, x, max_bs: int):
        outs = [fn(self.params, x[i:i + max_bs])
                for i in range(0, x.shape[0], max_bs)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def encode(self, video: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, 3) -> (B, t, h, w, latent_ch), normalized."""
        b, t = video.shape[:2]
        if self.temporal_compression_factor == 1:   # image path
            chunks = video.reshape(b * t, 1, *video.shape[2:])
            lat = self._batched(self._enc, chunks, self.max_enc_batch_size)
            lat = lat.reshape(b, t, *lat.shape[2:])
            return (lat - self.latent_mean) / self.latent_std
        pcd = self.pixel_chunk_duration
        assert t % pcd == 0, f"T={t} not divisible by chunk {pcd}"
        n = t // pcd
        chunks = video.reshape(b * n, pcd, *video.shape[2:])
        lat = self._batched(self._enc, chunks, self.max_enc_batch_size)
        lat = lat.reshape(b, n * lat.shape[1], *lat.shape[2:])
        return (lat - self.latent_mean) / self.latent_std

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        """(B, t, h, w, latent_ch) -> (B, T, H, W, 3)."""
        latent = latent * self.latent_std + self.latent_mean
        b, t = latent.shape[:2]
        if self.temporal_compression_factor == 1:
            chunks = latent.reshape(b * t, 1, *latent.shape[2:])
            out = self._batched(self._dec, chunks, self.max_dec_batch_size)
            return out.reshape(b, t, *out.shape[2:])
        lcd = self.latent_chunk_duration
        assert t % lcd == 0, f"latent T={t} not divisible by {lcd}"
        n = t // lcd
        chunks = latent.reshape(b * n, lcd, *latent.shape[2:])
        out = self._batched(self._dec, chunks, self.max_dec_batch_size)
        assert out.shape[1] == self.pixel_chunk_duration
        return out.reshape(b, n * out.shape[1], *out.shape[2:])
