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
           "ImageTokenizer", "JointImageVideoTokenizer", "cv_config_8x8x8"]


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
        """(B, T, H, W, 3) -> (B, t, h, w, latent_ch), normalized.

        Normalization happens at CHUNK level: the reference's mean/std are
        per latent-chunk-position tensors of shape
        (latent_ch, latent_chunk_duration) (pretrained_vae.py:343-360
        applies them inside JITVAE.encode, i.e. per (b n) chunk before
        reassembly), so a (t, 1, 1, C)-shaped `latent_mean` broadcasts per
        chunk here exactly like the reference. Scalars are position-free
        and behave identically either way."""
        b, t = video.shape[:2]
        if self.temporal_compression_factor == 1:   # image path
            chunks = video.reshape(b * t, 1, *video.shape[2:])
        else:
            pcd = self.pixel_chunk_duration
            assert t % pcd == 0, f"T={t} not divisible by chunk {pcd}"
            chunks = video.reshape(b * (t // pcd), pcd, *video.shape[2:])
        lat = self._batched(self._enc, chunks, self.max_enc_batch_size)
        lat = (lat - self.latent_mean) / self.latent_std
        return lat.reshape(b, -1, *lat.shape[2:])

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        """(B, t, h, w, latent_ch) -> (B, T, H, W, 3)."""
        b, t = latent.shape[:2]
        if self.temporal_compression_factor == 1:
            chunks = latent.reshape(b * t, 1, *latent.shape[2:])
        else:
            lcd = self.latent_chunk_duration
            assert t % lcd == 0, f"latent T={t} not divisible by {lcd}"
            chunks = latent.reshape(b * (t // lcd), lcd, *latent.shape[2:])
        chunks = chunks * self.latent_std + self.latent_mean
        out = self._batched(self._dec, chunks, self.max_dec_batch_size)
        if self.temporal_compression_factor != 1:
            assert out.shape[1] == self.pixel_chunk_duration
        return out.reshape(b, -1, *out.shape[2:])


@dataclasses.dataclass
class ImageTokenizer:
    """JITVAE equivalent (pretrained_vae.py:64-233): jitted encode/decode
    around a wrapped module with image-specific latent mean/std.

    Shape-agnostic by design, matching the two ways the reference uses
    JITVAE: a true 2D image VAE sees (B, H, W, C) (`is_image=True`,
    squeeze-for-image joint wrappers), while the shared-JIT joint tokenizer
    routes single-frame (B, 1, H, W, C) clips through the CAUSAL VIDEO net
    with the image mean/std pair (`is_image=False`,
    JointImageVideoSharedJITTokenizer, pretrained_vae.py:589-620)."""

    module: Any
    params: Any
    latent_mean: Any = 0.0           # broadcastable to the latent
    latent_std: Any = 1.0
    max_batch_size: int = 8

    def __post_init__(self):
        mod = self.module
        self._enc = jax.jit(lambda p, v: mod.apply(
            p, v, method=type(mod).encode))
        self._dec = jax.jit(lambda p, z: mod.apply(
            p, z, method=type(mod).decode))

    @property
    def latent_ch(self) -> int:
        return self.module.cfg.embedding_dim

    def _batched(self, fn, x):
        outs = [fn(self.params, x[i:i + self.max_batch_size])
                for i in range(0, x.shape[0], self.max_batch_size)]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)

    def encode(self, state: jnp.ndarray) -> jnp.ndarray:
        return (self._batched(self._enc, state)
                - self.latent_mean) / self.latent_std

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        return self._batched(
            self._dec, latent * self.latent_std + self.latent_mean)


@dataclasses.dataclass
class JointImageVideoTokenizer:
    """T==1 dispatch composite (pretrained_vae.py:508-606): single-frame
    inputs route to the image VAE, clips route to the chunked video
    tokenizer. With `squeeze_for_image` the T axis is dropped around the
    image VAE call ((B, 1, H, W, C) <-> (B, H, W, C)); the shared-JIT
    variant (`squeeze_for_image=False`) instead keeps the T axis and runs
    the shared causal video net with the image mean/std pair."""

    image_vae: Any                   # ImageTokenizer (or compatible)
    video_vae: VideoTokenizer
    squeeze_for_image: bool = True

    @classmethod
    def shared_jit(cls, module, params, image_mean_std=(0.0, 1.0),
                   video_mean_std=(0.0, 1.0), **video_kwargs
                   ) -> "JointImageVideoTokenizer":
        """JointImageVideoSharedJITTokenizer (pretrained_vae.py:589-620):
        one causal video net serves both branches; image and video get
        SEPARATE mean/std pairs (the net is non-causal across the two
        training regimes), and the image branch keeps its T=1 axis."""
        video = VideoTokenizer(module, params,
                               latent_mean=video_mean_std[0],
                               latent_std=video_mean_std[1], **video_kwargs)
        image = ImageTokenizer(module, params,
                               latent_mean=image_mean_std[0],
                               latent_std=image_mean_std[1])
        return cls(image_vae=image, video_vae=video, squeeze_for_image=False)

    def encode_image(self, state: jnp.ndarray) -> jnp.ndarray:
        if self.squeeze_for_image:
            return self.image_vae.encode(state[:, 0])[:, None]
        return self.image_vae.encode(state)

    def decode_image(self, latent: jnp.ndarray) -> jnp.ndarray:
        if self.squeeze_for_image:
            return self.image_vae.decode(latent[:, 0])[:, None]
        return self.image_vae.decode(latent)

    def encode(self, state: jnp.ndarray) -> jnp.ndarray:
        """(B, T, H, W, C): T==1 -> image branch, else chunked video."""
        if state.shape[1] == 1:
            return self.encode_image(state)
        return self.video_vae.encode(state)

    def decode(self, latent: jnp.ndarray) -> jnp.ndarray:
        if latent.shape[1] == 1:
            return self.decode_image(latent)
        return self.video_vae.decode(latent)

    def get_latent_num_frames(self, num_pixel_frames: int) -> int:
        if num_pixel_frames == 1:
            return 1
        return self.video_vae.get_latent_num_frames(num_pixel_frames)

    def get_pixel_num_frames(self, num_latent_frames: int) -> int:
        if num_latent_frames == 1:
            return 1
        return self.video_vae.get_pixel_num_frames(num_latent_frames)

    @property
    def latent_ch(self) -> int:
        return self.video_vae.latent_ch

    @property
    def pixel_chunk_duration(self) -> int:
        return self.video_vae.pixel_chunk_duration

    @property
    def latent_chunk_duration(self) -> int:
        return self.video_vae.latent_chunk_duration

    @property
    def temporal_compression_factor(self) -> int:
        return self.video_vae.temporal_compression_factor
