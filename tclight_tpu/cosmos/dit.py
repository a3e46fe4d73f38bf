"""GeneralDIT: checkpoint-faithful adaLN video diffusion transformer.

Rebuild of cosmos1/models/diffusion/networks/general_dit.py (:40-520),
networks/general_dit_video_conditioned.py (`VideoExtendGeneralDIT` :28-203)
and module/blocks.py / module/attention.py / module/position_embedding.py,
matching the reference parameterization 1:1 so real Cosmos-1.0 diffusion
state dicts convert losslessly (models/convert.py::convert_general_dit):

- 3D patchify in the reference's channel-major patch order
  (`PatchEmbed` blocks.py:126, rearrange ``(c r m n)``), linear, no bias.
- `Timesteps` sincos (cos|sin halves, blocks.py:33) + `TimestepEmbedding`
  (blocks.py:54) with the adaLN-LoRA contract: with LoRA the affine
  embedding is the RAW sincos vector and linear_2 emits the shared
  (B, 3D) LoRA term added to every block's modulation.
- 3D video RoPE (`VideoRopePosition3DEmb` position_embedding.py:40):
  head_dim split dim_h = dim_w = head_dim//6*2, dim_t = rest, per-axis
  NTK factors from the extrapolation ratios, angles ordered [t|h|w] and
  applied rotate-half (TE `apply_rotary_pos_emb`, attention.py:273).
- `LearnablePosEmbAxis` (position_embedding.py:145): learnable per-axis
  embeddings summed over (t, h, w) then RMS-normalized over channels
  (attention.py::normalize eps=1e-6), added at the START of every
  transformer layer (blocks.py:534).
- Per-layer [FA, CA, MLP] `DITBuildingBlock`s (blocks.py:337): each with
  its own no-affine LayerNorm(eps 1e-6) + adaLN modulation
  (SiLU -> Linear[-> Linear] no-bias, 3-chunk shift/scale/gate), per-head
  RMSNorm on q,k (qkv_norm "RRI", attention.py:141-305), GELU MLP with
  no biases (`GPT2FeedForward` attention.py:80).
- `FinalLayer` (blocks.py:189): no-affine LayerNorm, 2-chunk adaLN
  (+ LoRA term's first 2D slice), linear head, channel-major unpatch
  (general_dit.py:346 ``(p1 p2 t C)``).
- optional affine-embedding RMSNorm (`affline_norm`, general_dit.py:173),
  padding-mask input channel (general_dit.py:302-308), cross-attn mask.
- `VideoExtendGeneralDIT`: condition-mask channel concat
  (general_dit_video_conditioned.py:100) and the augment-sigma embedder
  added onto the affine embedding (:167-175).

TPU-first: tokens are one flat (B, T*H*W, D) sequence in channels-last
layout; self-attention uses the Pallas flash kernel on TPU; context
parallelism = shard the token axis over the 'data' mesh axis
(parallel/sharded.build_cp_dit_forward — the TPU equivalent of the NeMo
cp_size recipe, SURVEY §2.8).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.ops.attention import dot_product_attention, flash_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """Mirror of the reference GeneralDIT constructor arguments
    (general_dit.py:83-118); `context_dim` is the reference's
    `crossattn_emb_channels`."""

    in_channels: int = 16
    out_channels: int = 16
    model_channels: int = 512
    num_blocks: int = 8
    num_heads: int = 8
    context_dim: int = 1024          # T5 feature dim
    mlp_ratio: float = 4.0
    block_config: str = "FA-CA-MLP"
    patch_spatial: int = 2
    patch_temporal: int = 1
    max_frames: int = 32
    max_img_h: int = 128             # pre-patchify pixels, like the ref
    max_img_w: int = 128
    concat_padding_mask: bool = True
    use_cross_attn_mask: bool = False
    affline_emb_norm: bool = True
    use_adaln_lora: bool = True
    adaln_lora_dim: int = 256
    rope_h_extrapolation_ratio: float = 1.0
    rope_w_extrapolation_ratio: float = 1.0
    rope_t_extrapolation_ratio: float = 1.0
    extra_per_block_abs_pos_emb: bool = True
    extra_h_extrapolation_ratio: float = 1.0
    extra_w_extrapolation_ratio: float = 1.0
    extra_t_extrapolation_ratio: float = 1.0
    add_augment_sigma_embedding: bool = False   # VideoExtendGeneralDIT
    norm_eps: float = 1e-6
    base_fps: int = 24
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "DiTConfig":
        return DiTConfig(in_channels=4, out_channels=4, model_channels=64,
                         num_blocks=2, num_heads=4, context_dim=32,
                         max_frames=8, max_img_h=16, max_img_w=16)

    @staticmethod
    def faditv2_7b(**overrides) -> "DiTConfig":
        """Cosmos-1.0-Diffusion-7B Text2World net
        (config/base/net.py:22-42 + inference override
        cosmos-1-diffusion-text2world.py:39-45)."""
        base = dict(in_channels=16, out_channels=16, model_channels=4096,
                    num_blocks=28, num_heads=32, max_img_h=240,
                    max_img_w=240, max_frames=128, patch_spatial=2,
                    patch_temporal=1, rope_t_extrapolation_ratio=2.0,
                    extra_per_block_abs_pos_emb=True)
        base.update(overrides)
        return DiTConfig(**base)

    @staticmethod
    def faditv2_14b(**overrides) -> "DiTConfig":
        """14B net (config/base/net.py:45-48 + t2w overrides :70-78)."""
        base = dict(model_channels=5120, num_heads=40, num_blocks=36,
                    rope_h_extrapolation_ratio=2.0,
                    rope_w_extrapolation_ratio=2.0,
                    rope_t_extrapolation_ratio=2.0,
                    extra_h_extrapolation_ratio=2.0,
                    extra_w_extrapolation_ratio=2.0,
                    extra_t_extrapolation_ratio=2.0)
        base.update(overrides)
        return DiTConfig.faditv2_7b(**base)

    @staticmethod
    def video2world_7b(**overrides) -> "DiTConfig":
        """Video2World variant: +1 condition-mask input channel
        (general_dit_video_conditioned.py:29,
        cosmos-1-diffusion-video2world.py:38). NB the reference's
        `add_augment_sigma_embedding` path is dead code there — its
        builder hook is never invoked — so released checkpoints carry no
        augment-sigma embedder and the default here is False."""
        base = dict(in_channels=17)
        base.update(overrides)
        return DiTConfig.faditv2_7b(**base)


def timesteps_embedding(timesteps: jnp.ndarray, num_channels: int
                        ) -> jnp.ndarray:
    """`Timesteps` sincos features, cos|sin halves (blocks.py:33-51)."""
    half = num_channels // 2
    exponent = -math.log(10000.0) * jnp.arange(half, dtype=jnp.float32)
    emb = jnp.exp(exponent / half)
    ang = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


class TimestepEmbedding(nn.Module):
    """blocks.py:54-80. Returns (emb_B_D, adaln_lora_B_3D|None): with
    adaLN-LoRA the affine embedding is the raw INPUT sincos vector and
    linear_2 produces the shared (B, 3D) LoRA modulation term."""

    out_features: int
    use_adaln_lora: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, sample):
        use_bias = not self.use_adaln_lora
        h = nn.Dense(self.out_features, use_bias=use_bias,
                     dtype=self.dtype, name="linear_1")(sample)
        h = nn.silu(h)
        out_dim = 3 * self.out_features if self.use_adaln_lora else self.out_features
        h = nn.Dense(out_dim, use_bias=use_bias, dtype=self.dtype,
                     name="linear_2")(h)
        if self.use_adaln_lora:
            return sample, h
        return h, None


class RMSNormTE(nn.Module):
    """TransformerEngine RMSNorm: x / sqrt(mean(x^2) + eps) * weight."""

    dim: int
    eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * w).astype(self.dtype)


def _rms_normalize(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """attention.py::normalize with dim=-1: x / (eps + ||x||_2/sqrt(D)) —
    i.e. normalize the channel RMS to 1."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    norm = eps + norm / np.sqrt(x.shape[-1])
    return (x.astype(jnp.float32) / norm).astype(x.dtype)


def video_rope_angles(head_dim: int, t: int, h: int, w: int,
                      h_ratio: float = 1.0, w_ratio: float = 1.0,
                      t_ratio: float = 1.0, base_fps: int = 24,
                      fps: Optional[float] = None) -> np.ndarray:
    """(T*H*W, head_dim) rotate-half angle table
    (`VideoRopePosition3DEmb.generate_embeddings`,
    position_embedding.py:81-142): head_dim split dim_h = dim_w =
    head_dim//6*2, dim_t = head_dim - 2*dim_h; per-axis NTK theta
    10000 * ratio**(dim/(dim-2)); half-angles ordered [t | h | w] and
    concatenated twice."""
    dim_h = head_dim // 6 * 2
    dim_w = dim_h
    dim_t = head_dim - 2 * dim_h
    assert head_dim == dim_h + dim_w + dim_t

    h_ntk = h_ratio ** (dim_h / (dim_h - 2))
    w_ntk = w_ratio ** (dim_w / (dim_w - 2))
    t_ntk = t_ratio ** (dim_t / (dim_t - 2))
    spatial_range = np.arange(0, dim_h, 2)[: dim_h // 2] / dim_h
    temporal_range = np.arange(0, dim_t, 2)[: dim_t // 2] / dim_t
    h_freqs = 1.0 / (10000.0 * h_ntk) ** spatial_range
    w_freqs = 1.0 / (10000.0 * w_ntk) ** spatial_range
    t_freqs = 1.0 / (10000.0 * t_ntk) ** temporal_range

    tpos = np.arange(t, dtype=np.float64)
    if fps is not None:
        tpos = tpos / fps * base_fps
    half_t = np.outer(tpos, t_freqs)                     # (T, dim_t/2)
    half_h = np.outer(np.arange(h), h_freqs)             # (H, dim_h/2)
    half_w = np.outer(np.arange(w), w_freqs)             # (W, dim_w/2)

    et = np.broadcast_to(half_t[:, None, None, :], (t, h, w, half_t.shape[1]))
    eh = np.broadcast_to(half_h[None, :, None, :], (t, h, w, half_h.shape[1]))
    ew = np.broadcast_to(half_w[None, None, :, :], (t, h, w, half_w.shape[1]))
    half = np.concatenate([et, eh, ew], axis=-1).reshape(t * h * w, -1)
    return np.concatenate([half, half], axis=-1).astype(np.float32)


def apply_rope_rotate_half(x: jnp.ndarray, angles: jnp.ndarray
                           ) -> jnp.ndarray:
    """x (B, S, H, D), angles (S, D) -> rotate-half RoPE (TE
    `apply_rotary_pos_emb` semantics)."""
    ang = angles[None, :, None, :].astype(jnp.float32)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    xf = x.astype(jnp.float32)
    return (xf * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


class Attention(nn.Module):
    """module/attention.py:141-305 `Attention` with qkv_norm "RRI"
    per-head: q,k get a learnable per-head RMSNorm, v none; rope is
    applied to q,k of self-attention only; all projections bias-free."""

    cfg: DiTConfig
    is_selfattn: bool
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, context=None, rope_angles=None, mask=None):
        cfg = self.cfg
        hd = cfg.model_channels // cfg.num_heads
        b, s, _ = x.shape
        ctx = x if context is None else context
        sk = ctx.shape[1]
        q = nn.Dense(cfg.model_channels, use_bias=False, dtype=cfg.dtype,
                     name="to_q_0")(x)
        k = nn.Dense(cfg.model_channels, use_bias=False, dtype=cfg.dtype,
                     name="to_k_0")(ctx)
        v = nn.Dense(cfg.model_channels, use_bias=False, dtype=cfg.dtype,
                     name="to_v_0")(ctx)
        q = q.reshape(b, s, cfg.num_heads, hd)
        k = k.reshape(b, sk, cfg.num_heads, hd)
        v = v.reshape(b, sk, cfg.num_heads, hd)
        q = RMSNormTE(hd, cfg.norm_eps, cfg.dtype, name="to_q_1")(q)
        k = RMSNormTE(hd, cfg.norm_eps, cfg.dtype, name="to_k_1")(k)
        if self.is_selfattn and rope_angles is not None:
            q = apply_rope_rotate_half(q, rope_angles)
            k = apply_rope_rotate_half(k, rope_angles)
        if self.is_selfattn and mask is None and s > 512:
            o = flash_attention(q, k, v, backend=self.attn_backend)
        else:
            o = dot_product_attention(q, k, v, mask=mask)
        return nn.Dense(cfg.model_channels, use_bias=False, dtype=cfg.dtype,
                        name="to_out_0")(o.reshape(b, s, cfg.model_channels))


class AdaLNModulation(nn.Module):
    """SiLU -> Linear [-> Linear] (bias-free); the last layer is
    zero-init to match the reference's initialize_weights
    (general_dit.py:196-201)."""

    cfg: DiTConfig
    n_chunks: int
    zero_init: bool = True

    @nn.compact
    def __call__(self, emb):
        cfg = self.cfg
        h = nn.silu(emb)
        out = self.n_chunks * cfg.model_channels
        last_init = (nn.initializers.zeros if self.zero_init
                     else nn.initializers.xavier_uniform())
        if cfg.use_adaln_lora:
            h = nn.Dense(cfg.adaln_lora_dim, use_bias=False, dtype=cfg.dtype,
                         name="adaLN_modulation_1")(h)
            return nn.Dense(out, use_bias=False, dtype=cfg.dtype,
                            kernel_init=last_init,
                            name="adaLN_modulation_2")(h)
        return nn.Dense(out, use_bias=False, dtype=cfg.dtype,
                        kernel_init=last_init, name="adaLN_modulation_1")(h)


class DITBuildingBlock(nn.Module):
    """One FA / CA / MLP sub-block with adaLN (blocks.py:337-465)."""

    cfg: DiTConfig
    block_type: str
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, emb, context, crossattn_mask=None,
                 rope_angles=None, adaln_lora=None):
        cfg = self.cfg
        mod = AdaLNModulation(cfg, 3, name="adaLN_modulation")(emb)
        if cfg.use_adaln_lora:
            mod = mod + adaln_lora
        shift, scale, gate = jnp.split(mod, 3, axis=-1)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False,
                         use_scale=False, dtype=cfg.dtype,
                         name="norm_state")(x)
        h = h * (1 + scale[:, None]) + shift[:, None]
        bt = self.block_type
        if bt == "mlp":
            h = nn.Dense(int(cfg.model_channels * cfg.mlp_ratio),
                         use_bias=False, dtype=cfg.dtype, name="layer1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(cfg.model_channels, use_bias=False, dtype=cfg.dtype,
                         name="layer2")(h)
        elif bt == "full_attn":
            h = Attention(cfg, True, self.attn_backend, name="attn")(
                h, rope_angles=rope_angles)
        elif bt == "cross_attn":
            h = Attention(cfg, False, self.attn_backend, name="attn")(
                h, context=context, mask=crossattn_mask)
        else:  # pragma: no cover - config guard
            raise ValueError(f"Unknown block type {bt}")
        return x + gate[:, None] * h


_BLOCK_TYPES = {"fa": "full_attn", "full_attn": "full_attn",
                "ca": "cross_attn", "cross_attn": "cross_attn",
                "mlp": "mlp", "ff": "mlp"}


class GeneralDITTransformerBlock(nn.Module):
    """One transformer layer = block_config sub-blocks; the extra
    per-block positional embedding is added first (blocks.py:524-545)."""

    cfg: DiTConfig
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, emb, context, crossattn_mask=None,
                 rope_angles=None, adaln_lora=None, extra_pos_emb=None):
        if extra_pos_emb is not None:
            x = x + extra_pos_emb
        for j, tok in enumerate(self.cfg.block_config.lower().split("-")):
            x = DITBuildingBlock(self.cfg, _BLOCK_TYPES[tok],
                                 self.attn_backend, name=f"blocks_{j}")(
                x, emb, context, crossattn_mask, rope_angles, adaln_lora)
        return x


class LearnablePosEmbAxis(nn.Module):
    """position_embedding.py:145-188: per-axis learnable embeddings summed
    over the (t, h, w) grid then channel-RMS-normalized."""

    cfg: DiTConfig
    len_t: int
    len_h: int
    len_w: int

    @nn.compact
    def __call__(self, t: int, h: int, w: int):
        cfg = self.cfg
        # a silent `emb[:t]` clamp on an oversized grid mis-shapes the
        # summed embedding and the final reshape scrambles channels
        assert t <= self.len_t and h <= self.len_h and w <= self.len_w, (
            f"latent grid ({t},{h},{w}) exceeds the learnable pos-emb "
            f"tables ({self.len_t},{self.len_h},{self.len_w}) — raise "
            f"max_frames/max_img_h/max_img_w")
        init = nn.initializers.truncated_normal(0.02)
        emb_h = self.param("pos_emb_h", init, (self.len_h, cfg.model_channels))
        emb_w = self.param("pos_emb_w", init, (self.len_w, cfg.model_channels))
        emb_t = self.param("pos_emb_t", init, (self.len_t, cfg.model_channels))
        emb = (emb_t[:t, None, None, :] + emb_h[None, :h, None, :]
               + emb_w[None, None, :w, :])
        return _rms_normalize(emb, cfg.norm_eps).reshape(t * h * w, -1)


class FinalLayer(nn.Module):
    """blocks.py:189-242: no-affine LayerNorm + 2-chunk adaLN (the LoRA
    path adds the first 2D of the shared LoRA term) + linear head."""

    cfg: DiTConfig

    @nn.compact
    def __call__(self, x, emb, adaln_lora=None):
        cfg = self.cfg
        mod = AdaLNModulation(cfg, 2, zero_init=False,
                              name="adaLN_modulation")(emb)
        if cfg.use_adaln_lora:
            mod = mod + adaln_lora[:, : 2 * cfg.model_channels]
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False,
                         use_scale=False, dtype=cfg.dtype,
                         name="norm_final")(x)
        h = h * (1 + scale[:, None]) + shift[:, None]
        out = (cfg.patch_spatial * cfg.patch_spatial * cfg.patch_temporal
               * cfg.out_channels)
        return nn.Dense(out, use_bias=False, dtype=cfg.dtype,
                        name="linear")(h)


class GeneralDIT(nn.Module):
    """Video DiT denoiser: (B, T, H, W, C) latents + context + timesteps ->
    (B, T, H, W, C_out), channels-last.

    Optional reference inputs: `crossattn_mask` (B, M), `fps` (scalar),
    `padding_mask` (B, H, W) (1 = padded; zeros when omitted and
    `concat_padding_mask` is set), `condition_video_input_mask`
    (B, T, H, W, 1) for the VideoExtend variant, and
    `condition_video_augment_sigma` (B,) feeding the augment-sigma
    embedder."""

    cfg: DiTConfig
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, timesteps, context, crossattn_mask=None,
                 fps=None, padding_mask=None,
                 condition_video_input_mask=None,
                 condition_video_augment_sigma=None):
        cfg = self.cfg
        if condition_video_input_mask is not None:
            # VideoExtendGeneralDIT.forward: channel-concat the condition
            # mask (general_dit_video_conditioned.py:100-104)
            x = jnp.concatenate(
                [x, condition_video_input_mask.astype(x.dtype)], axis=-1)
        b, t, h, w, _ = x.shape
        pt, p = cfg.patch_temporal, cfg.patch_spatial
        gt, gh, gw = t // pt, h // p, w // p

        if cfg.concat_padding_mask:
            if padding_mask is None:
                padding_mask = jnp.zeros((b, h, w), x.dtype)
            pm = jnp.broadcast_to(
                padding_mask.astype(x.dtype)[:, None, :, :, None],
                (b, t, h, w, 1))
            x = jnp.concatenate([x, pm], axis=-1)

        # 3D patchify in the reference's channel-major patch order
        # ``b c (t r) (h m) (w n) -> b t h w (c r m n)`` (blocks.py:153)
        z = x.reshape(b, gt, pt, gh, p, gw, p, x.shape[-1])
        z = z.transpose(0, 1, 3, 5, 7, 2, 4, 6).reshape(b, gt * gh * gw, -1)
        z = nn.Dense(cfg.model_channels, use_bias=False, dtype=cfg.dtype,
                     name="x_embedder")(z)

        sincos = timesteps_embedding(jnp.reshape(timesteps, (-1,)),
                                     cfg.model_channels)
        emb, adaln_lora = TimestepEmbedding(
            cfg.model_channels, cfg.use_adaln_lora, cfg.dtype,
            name="t_embedder")(sincos)
        if cfg.add_augment_sigma_embedding:
            if condition_video_augment_sigma is None:
                condition_video_augment_sigma = jnp.zeros((b,), jnp.float32)
            aug_sincos = timesteps_embedding(
                jnp.reshape(condition_video_augment_sigma, (-1,)),
                cfg.model_channels)
            aug_emb, _ = TimestepEmbedding(
                cfg.model_channels, cfg.use_adaln_lora, cfg.dtype,
                name="augment_sigma_embedder")(aug_sincos)
            emb = emb + aug_emb
        if cfg.affline_emb_norm:
            emb = RMSNormTE(cfg.model_channels, cfg.norm_eps, cfg.dtype,
                            name="affline_norm")(emb)

        head_dim = cfg.model_channels // cfg.num_heads
        fps_val = None if fps is None else float(fps)
        rope_angles = jnp.asarray(video_rope_angles(
            head_dim, gt, gh, gw,
            cfg.rope_h_extrapolation_ratio, cfg.rope_w_extrapolation_ratio,
            cfg.rope_t_extrapolation_ratio, cfg.base_fps, fps_val))

        extra_pos = None
        if cfg.extra_per_block_abs_pos_emb:
            extra_pos = LearnablePosEmbAxis(
                cfg, cfg.max_frames // pt, cfg.max_img_h // p,
                cfg.max_img_w // p, name="extra_pos_embedder")(gt, gh, gw)
            extra_pos = extra_pos[None].astype(cfg.dtype)

        if cfg.use_cross_attn_mask and crossattn_mask is not None:
            # (B, M) -> additive bias broadcast over heads and queries
            mask = crossattn_mask[:, None, None, :].astype(bool)
        else:
            mask = None

        for i in range(cfg.num_blocks):
            z = GeneralDITTransformerBlock(
                cfg, self.attn_backend, name=f"block{i}")(
                z, emb, context, mask, rope_angles, adaln_lora, extra_pos)

        z = FinalLayer(cfg, name="final_layer")(z, emb, adaln_lora)

        # unpatch in the reference's ``(p1 p2 t C)`` output order
        # (general_dit.py:346-355)
        z = z.reshape(b, gt, gh, gw, p, p, pt, cfg.out_channels)
        z = z.transpose(0, 1, 6, 2, 4, 3, 5, 7).reshape(
            b, t, h, w, cfg.out_channels)
        return z.astype(jnp.float32)


def VideoExtendGeneralDIT(cfg: DiTConfig,
                          attn_backend: Optional[str] = None) -> GeneralDIT:
    """The video-conditioned DiT variant
    (general_dit_video_conditioned.py:28): same network with +1 condition
    mask channel and the augment-sigma embedder; pass
    `condition_video_input_mask` / `condition_video_augment_sigma` at
    call time."""
    if not cfg.add_augment_sigma_embedding:
        cfg = dataclasses.replace(cfg, add_augment_sigma_embedding=True)
    return GeneralDIT(cfg, attn_backend)


def make_edm_denoiser(model: GeneralDIT, params, context, sigma_data: float = 0.5,
                      mesh=None):
    """Wrap the DiT as an EDM x0-prediction function (DiffusionT2WModel's
    denoiser contract, model_t2w.py). With `mesh`, the forward runs
    context-parallel: frame/token axis sharded over the mesh's 'data'
    axis (parallel/sharded.build_cp_dit_forward; the reference's
    Megatron `context_parallel_size` recipe knob, SURVEY §2.8)."""
    from tclight_tpu.cosmos.edm import EDMScaling

    scaling = EDMScaling(sigma_data)
    if mesh is not None:
        from tclight_tpu.parallel.sharded import build_cp_dit_forward

        fwd = build_cp_dit_forward(model, mesh)
    else:
        fwd = lambda p, x, cn, ctx: model.apply(p, x, cn, ctx)  # noqa: E731

    def x0_fn(x, sigma):
        sigma_b = jnp.broadcast_to(jnp.asarray(sigma), (x.shape[0],))
        c_skip, c_out, c_in, c_noise = scaling(sigma_b)
        bshape = (-1,) + (1,) * (x.ndim - 1)
        f = fwd(params, x * c_in.reshape(bshape), c_noise, context)
        return c_skip.reshape(bshape) * x + c_out.reshape(bshape) * f

    return x0_fn
