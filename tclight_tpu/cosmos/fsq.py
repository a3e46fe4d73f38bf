"""FSQ discrete video tokenizer: finite scalar quantization + causal 3D
Haar wavelet patching + conv encoder/decoder.

Rebuild of cosmos1/models/autoregressive/tokenizer/: `FSQuantizer`
(quantizers.py:27), `Patcher3D`/`UnPatcher3D` Haar-wavelet transforms
(patching.py:29-279), and a causal discrete video tokenizer
(`CausalDiscreteVideoTokenizer`, networks.py:28) with temporally-causal 3D
convolutions.

FSQ: each latent channel is bounded with tanh and rounded to one of
`levels[i]` values (straight-through); the joint code index is the mixed-
radix integer. Default levels (8,8,8,5,5,5) = 64000 codes (Cosmos DV).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FSQuantizer", "haar_patch_3d", "haar_unpatch_3d",
           "CausalDiscreteVideoTokenizer", "TokenizerConfig"]


class FSQuantizer:
    """Finite scalar quantizer (Mentzer et al.; quantizers.py:27)."""

    def __init__(self, levels: Sequence[int] = (8, 8, 8, 5, 5, 5)):
        self.levels = np.asarray(levels, np.int32)
        self.dim = len(levels)
        self.basis = np.concatenate(
            [[1], np.cumprod(self.levels[:-1])]
        ).astype(np.int64)

    @property
    def codebook_size(self) -> int:
        return int(np.prod(self.levels))

    def bound(self, z: jnp.ndarray) -> jnp.ndarray:
        lv = jnp.asarray(self.levels, jnp.float32)
        half = (lv - 1) / 2
        offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
        shift = jnp.tan(offset / jnp.maximum(half, 1e-6))
        return jnp.tanh(z + shift) * half - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """z (..., dim) -> quantized values with straight-through grads."""
        zb = self.bound(z)
        q = jnp.round(zb)
        return zb + jax.lax.stop_gradient(q - zb)

    def codes_to_indices(self, q: jnp.ndarray) -> jnp.ndarray:
        """digit_i = round(q_i + half_i + offset_i) in [0, L_i); index =
        mixed-radix combination."""
        lv = jnp.asarray(self.levels, jnp.float32)
        half = (lv - 1) / 2
        offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
        digits = jnp.round(q + half + offset)
        return jnp.sum(
            digits.astype(jnp.int64) * jnp.asarray(self.basis), axis=-1
        ).astype(jnp.int32)

    def indices_to_codes(self, idx: jnp.ndarray) -> jnp.ndarray:
        lv = jnp.asarray(self.levels, jnp.int64)
        lvf = jnp.asarray(self.levels, jnp.float32)
        half = (lvf - 1) / 2
        offset = jnp.where(lvf % 2 == 0, 0.5, 0.0)
        rem = idx.astype(jnp.int64)[..., None] // jnp.asarray(self.basis)
        digits = (rem % lv).astype(jnp.float32)
        return digits - half - offset


_H = 1.0 / np.sqrt(2.0)


def haar_patch_3d(x: jnp.ndarray, levels: int = 1) -> jnp.ndarray:
    """Causal 3D Haar wavelet packet transform (Patcher3D, patching.py:29):
    each level halves (T, H, W) and multiplies channels by 8. x:
    (B, T, H, W, C) with T even (pad by repeating the first frame for
    causal behavior upstream)."""
    for _ in range(levels):
        b, t, h, w, c = x.shape
        lo_t = (x[:, 0::2] + x[:, 1::2]) * _H
        hi_t = (x[:, 0::2] - x[:, 1::2]) * _H
        out_t = jnp.concatenate([lo_t, hi_t], axis=-1)
        lo_h = (out_t[:, :, 0::2] + out_t[:, :, 1::2]) * _H
        hi_h = (out_t[:, :, 0::2] - out_t[:, :, 1::2]) * _H
        out_h = jnp.concatenate([lo_h, hi_h], axis=-1)
        lo_w = (out_h[:, :, :, 0::2] + out_h[:, :, :, 1::2]) * _H
        hi_w = (out_h[:, :, :, 0::2] - out_h[:, :, :, 1::2]) * _H
        x = jnp.concatenate([lo_w, hi_w], axis=-1)
    return x


def haar_unpatch_3d(x: jnp.ndarray, levels: int = 1) -> jnp.ndarray:
    """Inverse of `haar_patch_3d` (UnPatcher3D, patching.py:161-279)."""
    for _ in range(levels):
        b, t, h, w, c = x.shape
        lo_w, hi_w = jnp.split(x, 2, axis=-1)
        rec_w = jnp.zeros((b, t, h, 2 * w, c // 2), x.dtype)
        rec_w = rec_w.at[:, :, :, 0::2].set((lo_w + hi_w) * _H)
        rec_w = rec_w.at[:, :, :, 1::2].set((lo_w - hi_w) * _H)
        lo_h, hi_h = jnp.split(rec_w, 2, axis=-1)
        rec_h = jnp.zeros((b, t, 2 * h, 2 * w, c // 4), x.dtype)
        rec_h = rec_h.at[:, :, 0::2].set((lo_h + hi_h) * _H)
        rec_h = rec_h.at[:, :, 1::2].set((lo_h - hi_h) * _H)
        lo_t, hi_t = jnp.split(rec_h, 2, axis=-1)
        rec_t = jnp.zeros((b, 2 * t, 2 * h, 2 * w, c // 8), x.dtype)
        rec_t = rec_t.at[:, 0::2].set((lo_t + hi_t) * _H)
        rec_t = rec_t.at[:, 1::2].set((lo_t - hi_t) * _H)
        x = rec_t
    return x


class CausalConv3D(nn.Module):
    """3D conv with causal temporal padding (left-pad time only)."""

    features: int
    kernel: tuple = (3, 3, 3)
    strides: tuple = (1, 1, 1)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel
        pad = ((kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2))
        return nn.Conv(self.features, self.kernel, strides=self.strides,
                       padding=pad, dtype=self.dtype)(x)


@dataclasses.dataclass(frozen=True)
class TokenizerConfig:
    channels: int = 64
    n_res_blocks: int = 2
    latent_dim: int = 6           # == len(fsq levels)
    fsq_levels: tuple = (8, 8, 8, 5, 5, 5)
    patch_levels: int = 1
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "TokenizerConfig":
        return TokenizerConfig(channels=16, n_res_blocks=1,
                               fsq_levels=(5, 5, 5), latent_dim=3)


class _ResBlock3D(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(x)
        h = nn.silu(h)
        h = CausalConv3D(self.features, dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=8, dtype=self.dtype)(h)
        h = nn.silu(h)
        h = CausalConv3D(self.features, dtype=self.dtype)(h)
        if x.shape[-1] != self.features:
            x = nn.Dense(self.features, dtype=self.dtype)(x)
        return x + h


class CausalDiscreteVideoTokenizer(nn.Module):
    """encode: video (B, T, H, W, 3) -> (indices, quantized latents);
    decode: indices -> video. Haar patching does the spatiotemporal
    downsampling; convs are temporally causal (networks.py:28)."""

    cfg: TokenizerConfig

    def setup(self):
        cfg = self.cfg
        self.quantizer = FSQuantizer(cfg.fsq_levels)
        self.enc_in = CausalConv3D(cfg.channels, dtype=cfg.dtype)
        self.enc_blocks = [
            _ResBlock3D(cfg.channels, cfg.dtype) for _ in range(cfg.n_res_blocks)
        ]
        self.enc_out = nn.Dense(len(cfg.fsq_levels), dtype=cfg.dtype)
        self.dec_in = nn.Dense(cfg.channels, dtype=cfg.dtype)
        self.dec_blocks = [
            _ResBlock3D(cfg.channels, cfg.dtype) for _ in range(cfg.n_res_blocks)
        ]
        self.dec_out = CausalConv3D(3 * 8 ** cfg.patch_levels, dtype=cfg.dtype)

    def encode(self, video):
        x = haar_patch_3d(video, self.cfg.patch_levels)
        h = self.enc_in(x)
        for blk in self.enc_blocks:
            h = blk(h)
        z = self.enc_out(h)
        q = self.quantizer.quantize(z)
        idx = self.quantizer.codes_to_indices(q)
        return idx, q

    def decode_codes(self, q):
        h = self.dec_in(q)
        for blk in self.dec_blocks:
            h = blk(h)
        x = self.dec_out(h)
        return haar_unpatch_3d(x, self.cfg.patch_levels)

    def decode_indices(self, idx):
        q = self.quantizer.indices_to_codes(idx)
        return self.decode_codes(q)

    def __call__(self, video):
        idx, q = self.encode(video)
        return self.decode_codes(q), idx
