"""UNet2DCondition (SD1.5 family) in Flax with first-class token merging.

TPU-native rebuild of the diffusers UNet the reference patches at runtime:
- the IC-Light conv_in widening (4 -> 8/12 channels) is just `in_channels`
  in the config (reference: utils/model_utils.py:22-26 rebuilds the conv);
- the `concat_conds` forward hook (model_utils.py:35-43) becomes an explicit
  channel concat done by the caller before `__call__`;
- VidToMe's runtime class surgery (utils/VidToMe/vidtome/patch.py:316-323)
  becomes a `ToMeSpec` the transformer blocks consume directly: merge ->
  self-attention -> unmerge, with the global token bank threaded through the
  call as a pytree (no CPU offload — banks stay in HBM; sharding the frame
  axis covers long videos).

Layout: NHWC activations, (B*F, H, W, C) with B = CFG batch (2) and F =
frames per chunk. All merge shapes are static (see ops/tome.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from tclight_tpu.models.layers import (
    Downsample2D,
    FeedForward,
    ResnetBlock2D,
    TimestepEmbedding,
    Upsample2D,
    timestep_embedding,
)
from tclight_tpu.ops.attention import dot_product_attention, flash_attention
from tclight_tpu.ops import tome

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ToMeSpec:
    """Static token-merging spec (reference knobs: patch.py apply_patch
    :234-275 / configs/tclight_default.yaml generation.*)."""

    n_frames: int = 4            # frames per chunk (chunk_size)
    local_ratio: float = 0.6
    merge_global: bool = True
    global_ratio: float = 0.5
    align_batch: bool = True
    max_downsample: int = 2
    target_stride: int = 4

    def merged_len(self, tokens_per_frame: int) -> int:
        """Static merged length after the local chain: unm_total + n_dst."""
        levels = tome.plan_local_levels(
            self.n_frames, tokens_per_frame, self.local_ratio, self.target_stride
        )
        if not levels:
            return tokens_per_frame
        last = levels[-1]
        return (last.unm_pre + (last.n_src - last.r)) + last.n_dst_frames * last.tnum


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4          # 8 for IC-Light fc, 12 for fbc
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_heads: int = 8
    context_dim: int = 768
    norm_groups: int = 32
    dtype: Any = jnp.float32

    @staticmethod
    def sd15(in_channels: int = 4, dtype=jnp.bfloat16) -> "UNetConfig":
        return UNetConfig(in_channels=in_channels, dtype=dtype)

    @staticmethod
    def tiny(in_channels: int = 4, dtype=jnp.float32) -> "UNetConfig":
        """Deterministic small config for tests (SURVEY §4 fixture (a))."""
        return UNetConfig(
            in_channels=in_channels,
            block_out_channels=(32, 64),
            layers_per_block=1,
            num_heads=2,
            context_dim=32,
            norm_groups=8,
            dtype=dtype,
        )


class Attention(nn.Module):
    """Multi-head attention with Pallas/XLA fused backends.

    `inject_qk=True` implements Plug-and-Play source injection
    (utils/VidToMe/pnp_utils.py:39-106): with batch layout
    [source, uncond, cond], every sample's Q/K are replaced by the source
    sample's, steering edited structure toward the source."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    backend: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None,
                 inject_qk: bool = False):
        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)
        if inject_qk:
            # batch = [src | uncond | cond] along axis 0 in thirds
            third = q.shape[0] // 3
            q = jnp.tile(q[:third], (3,) + (1,) * (q.ndim - 1))
            k = jnp.tile(k[:third], (3,) + (1,) * (k.ndim - 1))
        b, sq = q.shape[0], q.shape[1]
        skv = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, skv, self.heads, self.dim_head)
        v = v.reshape(b, skv, self.heads, self.dim_head)
        if skv <= 512:
            out = dot_product_attention(q, k, v)
        else:
            out = flash_attention(q, k, v, backend=self.backend)
        out = out.reshape(b, sq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class BasicTransformerBlock(nn.Module):
    """Self-attn -> cross-attn -> GEGLU FF block with explicit token
    merging around self-attention (the reference's ToMeBlock forward,
    patch.py:128-201, as straight-line code)."""

    dim: int
    heads: int
    context_dim: int
    tome_spec: Optional[ToMeSpec] = None
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,            # (B*F, T, C)
        context: jnp.ndarray,      # (B*F, S_ctx, C_ctx)
        merge_active: bool = False,
        randf: Optional[jnp.ndarray] = None,
        flip: Optional[jnp.ndarray] = None,
        bank: Optional[jnp.ndarray] = None,
        use_global: bool = False,
        pnp_attn: bool = False,
        dup_after_attn1: bool = False,
    ):
        dim_head = self.dim // self.heads
        attn1 = Attention(
            self.heads, dim_head, dtype=self.dtype, backend=self.attn_backend,
            name="attn1",
        )
        attn2 = Attention(
            self.heads, dim_head, context_dim=self.context_dim, dtype=self.dtype,
            backend=self.attn_backend, name="attn2",
        )
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        norm3 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")
        ff = FeedForward(self.dim, dtype=self.dtype, name="ff")

        h = norm1(x)
        new_bank = bank
        if merge_active and self.tome_spec is not None and self.tome_spec.n_frames > 1:
            spec = self.tome_spec
            f = spec.n_frames
            t_per_frame = h.shape[1]
            levels = tome.plan_local_levels(
                f, t_per_frame, spec.local_ratio, spec.target_stride
            )
            joined = tome.join_frame(h, f)
            local_merged, infos = tome.local_merge_sequence(
                joined, joined, levels, randf, spec.align_batch
            )
            l_len = local_merged.shape[1]
            # unmerges compose into ONE row gather: the local chain's int32
            # row maps (and the global level's, when active) fold together
            # so attn_out is gathered once at full width instead of once
            # per level (ops/tome.py unmerge_rows/compose_rows)
            rows = tome.local_unmerge_rows(infos)
            if spec.merge_global and use_global and bank is not None:
                merged, mi_g, _ = tome.global_merge(
                    local_merged, bank, local_merged, bank,
                    spec.global_ratio, flip, spec.align_batch,
                )
                g_rows = tome.global_unmerge_rows(mi_g, flip, l_len)
                new_bank = tome.gather_rows(merged, g_rows)
                attn_out = attn1(merged, inject_qk=pnp_attn)
                rows = tome.compose_rows(g_rows, rows)
            else:
                if spec.merge_global:
                    new_bank = local_merged
                attn_out = attn1(local_merged, inject_qk=pnp_attn)
            attn_out = tome.gather_rows(attn_out, rows)
            attn_out = tome.split_frame(attn_out, f)
        else:
            attn_out = attn1(h, inject_qk=pnp_attn)
        x = x + attn_out
        if dup_after_attn1:
            # CFG-prefix dedup (see UNet2DCondition.__call__ cfg_dedup):
            # everything up to here ran on the single shared half; the
            # [uncond | cond] pair first diverges at the cross-attention
            # below, so duplicate tokens (and the bank this block
            # produced) into the full CFG batch now
            x = jnp.concatenate([x, x], axis=0)
            if new_bank is not None:
                new_bank = jnp.concatenate([new_bank, new_bank], axis=0)
        x = x + attn2(norm2(x), context)
        x = x + ff(norm3(x))
        return x, new_bank


class Transformer2D(nn.Module):
    """GroupNorm + 1x1 proj in/out around one BasicTransformerBlock
    (diffusers Transformer2DModel with use_linear_projection=False)."""

    channels: int
    heads: int
    context_dim: int
    norm_groups: int
    tome_spec: Optional[ToMeSpec]
    dtype: Dtype = jnp.float32
    attn_backend: Optional[str] = None

    @nn.compact
    def __call__(self, x, context, merge_active, randf, flip, bank, use_global,
                 pnp_attn: bool = False, dup_after_attn1: bool = False):
        b, h, w, c = x.shape
        residual = x
        z = nn.GroupNorm(self.norm_groups, epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        z = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_in")(z)
        z = z.reshape(b, h * w, c)
        if dup_after_attn1 and bank is not None:
            # banks are stored at full CFG batch; this block computes on
            # the shared half (the halves are identical by construction)
            bank = bank[: bank.shape[0] // 2]
        z, new_bank = BasicTransformerBlock(
            self.channels, self.heads, self.context_dim, self.tome_spec,
            dtype=self.dtype, attn_backend=self.attn_backend,
            name="transformer_blocks_0",
        )(z, context, merge_active, randf, flip, bank, use_global, pnp_attn,
          dup_after_attn1)
        if dup_after_attn1:
            residual = jnp.concatenate([residual, residual], axis=0)
        z = z.reshape(residual.shape[0], h, w, c)
        z = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="proj_out")(z)
        return z + residual, new_bank


class UNet2DCondition(nn.Module):
    """SD1.5-topology conditional UNet (4-level, cross-attn on the first
    three levels + mid, 8 heads), NHWC, with ToMe plumbing.

    __call__(x, t, context, ...) -> (eps, new_banks) where `new_banks` is a
    dict {block_key: (B, L, C)} of global-merge token banks."""

    config: UNetConfig
    tome_spec: Optional[ToMeSpec] = None
    attn_backend: Optional[str] = None

    def _merge_active(self, h: int, w: int, h0: int, w0: int) -> bool:
        if self.tome_spec is None:
            return False
        downsample = int(math.ceil(math.sqrt((h0 * w0) / (h * w))))
        return downsample <= self.tome_spec.max_downsample

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                  # (B*F, H, W, C_in)
        timesteps: jnp.ndarray,          # scalar or (B*F,)
        context: jnp.ndarray,            # (B*F, S, context_dim)
        randf: Optional[jnp.ndarray] = None,
        flip: Optional[jnp.ndarray] = None,
        banks: Optional[dict] = None,
        use_global: bool = False,
        pnp_attn: bool = False,
        pnp_conv: bool = False,
        down_residuals: Optional[list] = None,
        mid_residual: Optional[jnp.ndarray] = None,
        cfg_dedup: bool = False,
    ):
        cfg = self.config
        ch = cfg.block_out_channels
        n_levels = len(ch)
        has_attn = [i < n_levels - 1 for i in range(n_levels)]
        h0, w0 = x.shape[1], x.shape[2]
        # CFG-prefix dedup: `x` carries the SINGLE shared half of the
        # [uncond | cond] pair (they are bit-identical until the first
        # cross-attention), `context` the full CFG batch. The first
        # attention block duplicates its tokens right before attn2
        # (dup_after_attn1), after which everything runs at full batch —
        # conv_in, the first resnet and the first (merged) self-attention
        # run once instead of twice. Exact: per-sample ops are
        # independent, and the align-batch matching is invariant to
        # duplicating identical batch entries.
        if cfg_dedup:
            assert context.shape[0] == 2 * x.shape[0], (
                "cfg_dedup: x is the shared half, context the full batch")
            assert not pnp_attn and not pnp_conv, "cfg_dedup excludes PnP"
            assert down_residuals is None and mid_residual is None, (
                "cfg_dedup excludes ControlNet residuals")
            assert len(ch) > 1, "cfg_dedup needs an attention level"
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))
        if randf is None:
            randf = jnp.int32(0)
        if flip is None:
            flip = jnp.bool_(False)
        banks = banks or {}
        new_banks: dict = {}

        temb = timestep_embedding(timesteps, ch[0])
        temb = TimestepEmbedding(ch[0] * 4, dtype=cfg.dtype, name="time_embedding")(temb)
        temb_full = (jnp.concatenate([temb, temb], axis=0) if cfg_dedup
                     else temb)
        pending_dedup = cfg_dedup

        def make_attn(level: int, key: str):
            return Transformer2D(
                ch[level], cfg.num_heads, cfg.context_dim, cfg.norm_groups,
                self.tome_spec, dtype=cfg.dtype, attn_backend=self.attn_backend,
                name=key,
            )

        h = nn.Conv(ch[0], (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                    name="conv_in")(x)
        skips = [jnp.concatenate([h, h], axis=0) if cfg_dedup else h]

        # down
        for lvl in range(n_levels):
            for blk in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch[lvl], dtype=cfg.dtype, groups=cfg.norm_groups,
                                  name=f"down_{lvl}_res_{blk}")(
                    h, temb if pending_dedup else temb_full)
                if has_attn[lvl]:
                    key = f"down_{lvl}_attn_{blk}"
                    active = self._merge_active(h.shape[1], h.shape[2], h0, w0)
                    h, nb = make_attn(lvl, key)(
                        h, context, active, randf, flip, banks.get(key),
                        use_global, False, pending_dedup,
                    )
                    pending_dedup = False
                    if nb is not None:
                        new_banks[key] = nb
                skips.append(h)
            if lvl < n_levels - 1:
                h = Downsample2D(ch[lvl], dtype=cfg.dtype, name=f"down_{lvl}_ds")(h)
                skips.append(h)

        # ControlNet residual injection (get_controlnet_kwargs,
        # VidToMe utils.py:312-326): one residual per saved skip
        if down_residuals is not None:
            assert len(down_residuals) == len(skips), (
                f"{len(down_residuals)} residuals vs {len(skips)} skips")
            skips = [s + r.astype(s.dtype)
                     for s, r in zip(skips, down_residuals)]

        # mid
        h = ResnetBlock2D(ch[-1], dtype=cfg.dtype, groups=cfg.norm_groups,
                          name="mid_res_0")(h, temb_full)
        key = "mid_attn"
        active = self._merge_active(h.shape[1], h.shape[2], h0, w0)
        h, nb = make_attn(n_levels - 1, key)(
            h, context, active, randf, flip, banks.get(key), use_global
        )
        if nb is not None:
            new_banks[key] = nb
        h = ResnetBlock2D(ch[-1], dtype=cfg.dtype, groups=cfg.norm_groups,
                          name="mid_res_1")(h, temb_full)
        if mid_residual is not None:
            h = h + mid_residual.astype(h.dtype)

        # up
        for lvl in reversed(range(n_levels)):
            for blk in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock2D(ch[lvl], dtype=cfg.dtype, groups=cfg.norm_groups,
                                  name=f"up_{lvl}_res_{blk}")(h, temb_full)
                # PnP feature injection site: up_blocks[1].resnets[1]
                # (pnp_utils.py:161-162) == second up resnet of the
                # second-coarsest level
                if pnp_conv and lvl == n_levels - 2 and blk == 1:
                    third = h.shape[0] // 3
                    h = jnp.tile(h[:third], (3, 1, 1, 1))
                if has_attn[lvl]:
                    key = f"up_{lvl}_attn_{blk}"
                    active = self._merge_active(h.shape[1], h.shape[2], h0, w0)
                    # PnP QK injection: decoder attn blocks 4-11
                    # (pnp_utils.py:101-106) — every up self-attn except
                    # up_blocks[1].attentions[0]
                    inject = pnp_attn and not (lvl == n_levels - 2 and blk == 0)
                    h, nb = make_attn(lvl, key)(
                        h, context, active, randf, flip, banks.get(key),
                        use_global, inject,
                    )
                    if nb is not None:
                        new_banks[key] = nb
            if lvl > 0:
                target = skips[-1].shape[1:3]
                h = Upsample2D(ch[lvl], dtype=cfg.dtype, name=f"up_{lvl}_us")(
                    h, out_size=target
                )

        h = nn.GroupNorm(cfg.norm_groups, epsilon=1e-5, dtype=cfg.dtype,
                         name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=cfg.dtype, name="conv_out")(h)
        return h.astype(jnp.float32), new_banks
