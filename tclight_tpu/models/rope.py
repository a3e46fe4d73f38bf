"""Rotary position embedding family for the AR stack.

Rebuild of cosmos1/models/autoregressive/modules/embedding.py:86-491:
- 1D RoPE with optional YaRN long-context extension (scale-factor smoothing
  between beta_slow/beta_fast cutoffs + mscale magnitude correction);
- 2D spatial and 3D video (T/H/W split frequency bands) RoPE;
- the two application conventions: V1 (mistral/llama pair-interleaved
  rotate_half, RotaryPositionEmbeddingPytorchV1:360-433) and V2
  (TransformerEngine half-split rotate, :287-357).

Tables are host-built numpy (static per model), shape (L, D, 2) holding
cos/sin (already mscale-multiplied), consumed by `apply_rope_tables`.
Oracle-parity tests vs the reference module: tests/test_rope.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["RopeSpec", "build_rope_tables", "apply_rope_tables",
           "yarn_scale_factors", "yarn_mscale"]


@dataclasses.dataclass(frozen=True)
class RopeSpec:
    variant: str = "v1"              # "v1" (interleaved) | "v2" (TE half-split)
    rope_dim: str = "1D"             # "1D" | "2D" | "3D"
    theta: float = 10000.0
    max_position_embeddings: Optional[int] = None
    original_max_position_embeddings: Optional[int] = None
    apply_yarn: bool = False
    scale: Optional[float] = None
    extrapolation_factor: int = 1
    attn_factor: int = 1
    beta_fast: int = 32
    beta_slow: int = 1
    latent_shape: Optional[tuple] = None            # (H, W) or (T, H, W)
    original_latent_shape: Optional[tuple] = None
    pad_to_multiple_of: Optional[int] = None
    # "text_to_world"-style bov token: prepend one zero-frequency position
    prepend_bov: bool = False


def yarn_scale_factors(inv_freq: np.ndarray, original_seq_len: int,
                       beta_fast: int, beta_slow: int,
                       scale: float) -> np.ndarray:
    """get_scale_factors (embedding.py:211-222): smooth low/high-frequency
    interpolation between 1/scale and 1."""
    high = 2 * math.pi * beta_fast / original_seq_len
    low = 2 * math.pi * beta_slow / original_seq_len
    smooth = np.clip((inv_freq - low) / (high - low), 0.0, 1.0)
    return (1.0 - smooth) / scale + smooth


def yarn_mscale(scale: float, attn_factor: float = 1.0) -> float:
    """get_mscale (embedding.py:147-151) x attn_factor."""
    if scale is None or scale <= 1:
        return 1.0 * attn_factor
    return (0.1 * math.log(scale) + 1.0) * attn_factor


def _freqs_and_mscale(spec: RopeSpec, head_dim: int, max_seq: int):
    """Per-position rotation angles `freqs` and mscale.

    1D -> (S, D/2); 2D/3D -> (L, D) (the x2-concatenated band layout of
    compute_freqs, embedding.py:170-209)."""
    if spec.rope_dim == "1D":
        inv = 1.0 / (spec.theta ** (np.arange(0, head_dim, 2,
                                              dtype=np.float64) / head_dim))
        mscale = 1.0
        if spec.apply_yarn:
            inv = inv * yarn_scale_factors(
                inv, spec.original_max_position_embeddings,
                spec.beta_fast, spec.beta_slow, spec.scale)
            mscale = yarn_mscale(spec.scale, spec.attn_factor)
        seq = np.arange(max_seq, dtype=np.float64)
        return np.outer(seq, inv), mscale

    if spec.rope_dim == "2D":
        h, w = spec.latent_shape
        dim_h = head_dim // 2
        # NB the reference computes (theta ** range) / dim — missing
        # parentheses vs the 1D/3D forms (embedding.py:246-248) — and in
        # float32, where theta**k overflows to inf (freq 0) beyond the
        # first few bands; both quirks kept verbatim for parity
        with np.errstate(over="ignore"):
            spatial_inv = (1.0 / (
                np.float32(spec.theta)
                ** np.arange(0, dim_h, 2, dtype=np.float32) / dim_h
            )).astype(np.float64)
        mscale = 1.0
        if spec.apply_yarn:
            spatial_inv = spatial_inv * yarn_scale_factors(
                spatial_inv, spec.original_latent_shape[0],
                spec.beta_fast, spec.beta_slow, spec.scale)
            mscale = yarn_mscale(spec.scale, spec.attn_factor)
        seq = np.arange(max(h, w), dtype=np.float64)
        emb_h = np.outer(seq[:h], spatial_inv)        # (H, dh/2)
        emb_w = np.outer(seq[:w], spatial_inv)        # (W, dh/2)
        grid = np.concatenate(
            [np.broadcast_to(emb_h[:, None, :], (h, w, emb_h.shape[-1])),
             np.broadcast_to(emb_w[None, :, :], (h, w, emb_w.shape[-1]))] * 2,
            axis=-1)
        return grid.reshape(h * w, -1), mscale

    if spec.rope_dim == "3D":
        t, h, w = spec.latent_shape
        dim_h = head_dim // 6 * 2
        dim_t = head_dim - 2 * dim_h
        sp_range = np.arange(0, dim_h, 2, dtype=np.float64)[: dim_h // 2] / dim_h
        spatial_inv = 1.0 / (spec.theta ** sp_range)
        t_range = np.arange(0, dim_t, 2, dtype=np.float64)[: dim_t // 2] / dim_t
        temporal_inv = 1.0 / (spec.theta ** t_range)
        mscale = 1.0
        if spec.apply_yarn:
            spatial_inv = spatial_inv * yarn_scale_factors(
                spatial_inv, spec.original_latent_shape[1],
                spec.beta_fast, spec.beta_slow, spec.scale)
            temporal_inv = temporal_inv * yarn_scale_factors(
                temporal_inv, spec.original_latent_shape[0],
                spec.beta_fast, spec.beta_slow, spec.scale)
            mscale = yarn_mscale(spec.scale, spec.attn_factor)
        seq = np.arange(max(t, h, w), dtype=np.float64)
        emb_t = np.outer(seq[:t], temporal_inv)
        emb_h = np.outer(seq[:h], spatial_inv)
        emb_w = np.outer(seq[:w], spatial_inv)
        grid = np.concatenate(
            [np.broadcast_to(emb_t[:, None, None, :],
                             (t, h, w, emb_t.shape[-1])),
             np.broadcast_to(emb_h[None, :, None, :],
                             (t, h, w, emb_h.shape[-1])),
             np.broadcast_to(emb_w[None, None, :, :],
                             (t, h, w, emb_w.shape[-1]))] * 2,
            axis=-1)
        return grid.reshape(t * h * w, -1), mscale

    raise ValueError(f"invalid rope_dim {spec.rope_dim}")


def build_rope_tables(spec: RopeSpec, head_dim: int,
                      max_seq: Optional[int] = None) -> np.ndarray:
    """-> (L, D, 2) float32 cos/sin tables (mscale applied).

    V1 1D duplicates each pair angle interleaved (stack+reshape,
    embedding.py:378); V2 1D concatenates the halves (cat((f, f)),
    :313-315). 2D/3D angles are already full-width."""
    if spec.rope_dim == "1D":
        if max_seq is None:
            max_seq = spec.max_position_embeddings
        freqs, mscale = _freqs_and_mscale(spec, head_dim, max_seq)
        if spec.variant == "v1":
            emb = np.stack([freqs, freqs], axis=-1).reshape(freqs.shape[0], -1)
        else:
            emb = np.concatenate([freqs, freqs], axis=-1)
    else:
        emb, mscale = _freqs_and_mscale(spec, head_dim, 0)
        if spec.prepend_bov:
            emb = np.concatenate([np.zeros((1, emb.shape[-1])), emb], axis=0)
        if spec.pad_to_multiple_of:
            pad = (-emb.shape[0]) % spec.pad_to_multiple_of
            if pad:
                emb = np.concatenate(
                    [emb, np.zeros((pad, emb.shape[-1]))], axis=0)
    return np.stack([np.cos(emb) * mscale, np.sin(emb) * mscale],
                    axis=-1).astype(np.float32)


def apply_rope_tables(x: jnp.ndarray, rope: jnp.ndarray,
                      positions: jnp.ndarray, variant: str = "v1"):
    """x: (B, S, H, D); rope: (L, D, 2); positions: (S,) or (B, S).

    variant 'v1': pair-interleaved rotate_half (embedding.py:382-388);
    'v2': TransformerEngine half-split rotate (:45-53). Dims beyond the
    table width pass through unrotated (t_pass, :76-79)."""
    cs = rope[positions]
    if cs.ndim == 3:
        cs = cs[None]
    rot_dim = rope.shape[1]
    t, t_pass = x[..., :rot_dim], x[..., rot_dim:]
    cos = cs[..., 0][:, :, None, :]
    sin = cs[..., 1][:, :, None, :]
    if variant == "v1":
        tr = t.reshape(t.shape[:-1] + (-1, 2))
        rot = jnp.stack([-tr[..., 1], tr[..., 0]], axis=-1).reshape(t.shape)
    else:
        half = rot_dim // 2
        rot = jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)
    out = t * cos + rot * sin
    if t_pass.shape[-1]:
        out = jnp.concatenate([out, t_pass], axis=-1)
    return out.astype(x.dtype)
