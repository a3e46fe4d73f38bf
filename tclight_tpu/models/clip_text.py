"""CLIP text encoder (ViT-L/14 text tower) in Flax.

Rebuild of the transformers CLIPTextModel used for prompt encoding
(utils/model_utils.py:13, chunked >77-token encoding at generate.py:97-135).
Returns the final-layer hidden states (what SD1.5 cross-attends to).
Tokenization is delegated to `transformers.CLIPTokenizer` (pure python,
no torch) at the pipeline layer.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_positions: int = 77
    intermediate_size: int = 3072
    dtype: Any = jnp.float32

    @staticmethod
    def sd15(dtype=jnp.float32) -> "CLIPTextConfig":
        return CLIPTextConfig(dtype=dtype)

    @staticmethod
    def vit_b32(dtype=jnp.float32) -> "CLIPTextConfig":
        """openai CLIP ViT-B/32 text tower (hidden 512, proj 512)."""
        return CLIPTextConfig(hidden_size=512, num_layers=12, num_heads=8,
                              intermediate_size=2048, dtype=dtype)

    @staticmethod
    def vit_h14(dtype=jnp.float32) -> "CLIPTextConfig":
        """laion CLIP-ViT-H-14 text tower (the PickScore_v1 backbone)."""
        return CLIPTextConfig(hidden_size=1024, num_layers=24, num_heads=16,
                              intermediate_size=4096, dtype=dtype)

    @staticmethod
    def tiny(dtype=jnp.float32) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
            max_positions=77, intermediate_size=64, dtype=dtype,
        )


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        h = cfg.num_heads
        d = cfg.hidden_size // h
        b, s, _ = x.shape
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q_proj")(x)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k_proj")(x)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v_proj")(x)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / jnp.sqrt(d)
        logits = jnp.where(mask[None, None], logits, -jnp.inf)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out_proj")(out)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        x = x + CLIPAttention(cfg, name="self_attn")(
            nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm1")(x), mask
        )
        h = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="mlp_fc1")(h)
        h = quick_gelu(h)
        h = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        """input_ids: (B, S) int32 -> last hidden states (B, S, hidden)."""
        cfg = self.config
        s = input_ids.shape[1]
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=cfg.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.hidden_size),
        )
        x = tok + pos[None, :s].astype(cfg.dtype)
        causal = jnp.tril(jnp.ones((s, s), dtype=bool))
        for i in range(cfg.num_layers):
            x = CLIPLayer(cfg, name=f"layers_{i}")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="final_layer_norm")(x)
        return x.astype(jnp.float32)
