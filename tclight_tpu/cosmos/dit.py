"""GeneralDIT: adaLN video diffusion transformer.

Rebuild of cosmos1/models/diffusion/networks/general_dit.py (:40-520) and
module/blocks.py: 3D patchification (`PatchEmbed` blocks.py:126), 3D video
RoPE (`VideoRopePosition3DEmb` position_embedding.py:40) + learnable
per-axis embeddings (:145), full-attention + cross-attention + MLP blocks
with adaLN modulation (`DITBuildingBlock` blocks.py:337-545, `VideoAttn`
:245), Fourier timestep features (:33-124) and the adaLN `FinalLayer`
(:189).

TPU-first: tokens are one flat (B, T*H*W, D) sequence; self-attention uses
the Pallas flash kernel on TPU; context parallelism = shard the token axis
of the sequence over the 'data' mesh axis (the TPU equivalent of the NeMo
cp_size recipe, SURVEY §2.8).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.ar_transformer import rope_frequencies, apply_rope
from tclight_tpu.ops.attention import dot_product_attention, flash_attention

Dtype = Any


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 16
    out_channels: int = 16
    dim: int = 512
    n_layers: int = 8
    n_heads: int = 8
    context_dim: int = 1024      # T5 feature dim
    patch_t: int = 1
    patch_hw: int = 2
    max_t: int = 32
    max_h: int = 64
    max_w: int = 64
    norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "DiTConfig":
        return DiTConfig(in_channels=4, out_channels=4, dim=64, n_layers=2,
                         n_heads=4, context_dim=32, max_t=4, max_h=8, max_w=8)


class FourierFeatures(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        freqs = self.param("freqs", nn.initializers.normal(1.0), (self.dim // 2,))
        angles = 2 * jnp.pi * t[:, None] * freqs[None]
        return jnp.concatenate([jnp.cos(angles), jnp.sin(angles)], axis=-1).astype(self.dtype)


class TimestepMLP(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        h = FourierFeatures(256, self.dtype, name="fourier")(t)
        h = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(h)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(h)


def _modulate(x, shift, scale):
    return x * (1 + scale[:, None]) + shift[:, None]


class VideoRope3D:
    """3D factorized RoPE: head dim split T/H/W (position_embedding.py:40)."""

    def __init__(self, cfg: DiTConfig):
        hd = cfg.dim // cfg.n_heads
        self.dt = hd // 2
        self.dh = hd // 4
        self.dw = hd - self.dt - self.dh
        # each chunk must be even for pair rotation
        self.dt -= self.dt % 2
        self.dh -= self.dh % 2
        self.dw = hd - self.dt - self.dh
        self.dw -= self.dw % 2
        self.rope_t = rope_frequencies(self.dt, cfg.max_t, 10000.0)
        self.rope_h = rope_frequencies(self.dh, cfg.max_h, 10000.0)
        self.rope_w = rope_frequencies(self.dw, cfg.max_w, 10000.0)

    def __call__(self, x, tpos, hpos, wpos):
        """x (B, S, H, D); positions (S,)."""
        parts = []
        o = 0
        for d, rope, pos in ((self.dt, self.rope_t, tpos),
                             (self.dh, self.rope_h, hpos),
                             (self.dw, self.rope_w, wpos)):
            if d > 0:
                parts.append(apply_rope(x[..., o : o + d], rope, pos))
            o += d
        if o < x.shape[-1]:
            parts.append(x[..., o:])
        return jnp.concatenate(parts, axis=-1)


class DiTBlock(nn.Module):
    """adaLN [self-attn -> cross-attn -> MLP] block (blocks.py:337-545)."""

    cfg: DiTConfig
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, context, temb, rope3d, positions):
        cfg = self.cfg
        hd = cfg.dim // cfg.n_heads
        b, s, _ = x.shape
        mod = nn.Dense(9 * cfg.dim, dtype=cfg.dtype, name="adaLN")(nn.silu(temb))
        (sa_shift, sa_scale, sa_gate,
         ca_shift, ca_scale, ca_gate,
         mlp_shift, mlp_scale, mlp_gate) = jnp.split(mod, 9, axis=-1)

        # self-attention with 3D rope
        h = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                         dtype=cfg.dtype, name="norm_sa")(x)
        h = _modulate(h, sa_shift, sa_scale)
        q = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="sa_q")(h)
        k = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="sa_k")(h)
        v = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="sa_v")(h)
        q = rope3d(q.reshape(b, s, cfg.n_heads, hd), *positions)
        k = rope3d(k.reshape(b, s, cfg.n_heads, hd), *positions)
        v = v.reshape(b, s, cfg.n_heads, hd)
        if s <= 512:
            o = dot_product_attention(q, k, v)
        else:
            o = flash_attention(q, k, v, backend=self.attn_backend)
        o = nn.Dense(cfg.dim, dtype=cfg.dtype, name="sa_out")(o.reshape(b, s, cfg.dim))
        x = x + sa_gate[:, None] * o

        # cross-attention to text context
        h = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                         dtype=cfg.dtype, name="norm_ca")(x)
        h = _modulate(h, ca_shift, ca_scale)
        q = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="ca_q")(h)
        k = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="ca_k")(context)
        v = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="ca_v")(context)
        sk = k.shape[1]
        o = dot_product_attention(
            q.reshape(b, s, cfg.n_heads, hd),
            k.reshape(b, sk, cfg.n_heads, hd),
            v.reshape(b, sk, cfg.n_heads, hd),
        )
        o = nn.Dense(cfg.dim, dtype=cfg.dtype, name="ca_out")(o.reshape(b, s, cfg.dim))
        x = x + ca_gate[:, None] * o

        # MLP
        h = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                         dtype=cfg.dtype, name="norm_mlp")(x)
        h = _modulate(h, mlp_shift, mlp_scale)
        h = nn.Dense(cfg.dim * 4, dtype=cfg.dtype, name="mlp_1")(h)
        h = nn.gelu(h)
        h = nn.Dense(cfg.dim, dtype=cfg.dtype, name="mlp_2")(h)
        return x + mlp_gate[:, None] * h


class GeneralDIT(nn.Module):
    """Video DiT denoiser: (B, T, H, W, C) latents + T5 context + sigma ->
    (B, T, H, W, C_out)."""

    cfg: DiTConfig
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, c_noise, context):
        cfg = self.cfg
        b, t, h, w, _ = x.shape
        pt, p = cfg.patch_t, cfg.patch_hw
        gt, gh, gw = t // pt, h // p, w // p

        # 3D patchify
        z = x.reshape(b, gt, pt, gh, p, gw, p, x.shape[-1])
        z = z.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(b, gt * gh * gw, -1)
        z = nn.Dense(cfg.dim, dtype=cfg.dtype, name="patch_embed")(z)

        temb = TimestepMLP(cfg.dim, cfg.dtype, name="t_embedder")(c_noise)
        ctx = nn.Dense(cfg.dim, dtype=cfg.dtype, name="context_proj")(context)

        rope3d = VideoRope3D(cfg)
        tpos = jnp.repeat(jnp.arange(gt), gh * gw)
        hpos = jnp.tile(jnp.repeat(jnp.arange(gh), gw), gt)
        wpos = jnp.tile(jnp.arange(gw), gt * gh)
        positions = (tpos, hpos, wpos)

        for i in range(cfg.n_layers):
            z = DiTBlock(cfg, self.attn_backend, name=f"blocks_{i}")(
                z, ctx, temb, rope3d, positions
            )

        # adaLN final layer
        mod = nn.Dense(2 * cfg.dim, dtype=cfg.dtype, name="final_adaLN")(nn.silu(temb))
        shift, scale = jnp.split(mod, 2, axis=-1)
        z = nn.LayerNorm(epsilon=cfg.norm_eps, use_bias=False, use_scale=False,
                         dtype=cfg.dtype, name="final_norm")(z)
        z = _modulate(z, shift, scale)
        z = nn.Dense(pt * p * p * cfg.out_channels, dtype=cfg.dtype,
                     name="final_proj")(z)

        z = z.reshape(b, gt, gh, gw, pt, p, p, cfg.out_channels)
        z = z.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, t, h, w, cfg.out_channels)
        return z.astype(jnp.float32)


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
