"""T5 encoder stack in Flax + HF checkpoint converter.

TPU-native replacement for the reference's `CosmosT5TextEncoder`
(cosmos1/models/common/t5_text_encoder.py:27 — a torch
`T5EncoderModel.from_pretrained("t5-11b")` wrapper): the same encoder
math (T5 RMS layernorm without mean subtraction, un-scaled attention
logits with a learned relative-position bias on block 0, relu or
gated-gelu feed-forward) as a jittable Flax module, so prompt encoding
for the Cosmos DiT runs on device instead of host torch.

`convert_t5_encoder` maps a HF `T5EncoderModel` state dict (t5-11b or any
size) onto the param tree; parity is tested against the transformers CPU
oracle on a tiny random config (tests/test_t5.py).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["T5Config", "T5Encoder", "convert_t5_encoder"]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 32128
    d_model: int = 1024
    d_kv: int = 128
    d_ff: int = 65536
    n_layers: int = 24
    n_heads: int = 128
    rel_buckets: int = 32
    rel_max_distance: int = 128
    gated_ff: bool = False       # t5-11b (v1.0) uses plain relu
    layer_norm_eps: float = 1e-6
    dtype: Any = jnp.float32

    @staticmethod
    def t5_11b() -> "T5Config":
        return T5Config()

    @staticmethod
    def tiny() -> "T5Config":
        return T5Config(vocab_size=128, d_model=32, d_kv=8, d_ff=64,
                        n_layers=2, n_heads=4)


class T5LayerNorm(nn.Module):
    """RMS-only layer norm (no mean subtraction, no bias)."""

    eps: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return x * w.astype(x.dtype)


def _rel_bucket(rel_pos: jnp.ndarray, num_buckets: int, max_dist: int):
    """HF T5 bidirectional relative position bucketing."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-9)
        / np.log(max_dist / max_exact)
        * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_large = jnp.minimum(val_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_large)


class T5SelfAttention(nn.Module):
    cfg: T5Config
    has_rel_bias: bool = False

    @nn.compact
    def __call__(self, x, mask, pos_bias):
        cfg = self.cfg
        inner = cfg.n_heads * cfg.d_kv
        b, s, _ = x.shape
        q = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=cfg.dtype, name="v")(x)
        q = q.reshape(b, s, cfg.n_heads, cfg.d_kv)
        k = k.reshape(b, s, cfg.n_heads, cfg.d_kv)
        v = v.reshape(b, s, cfg.n_heads, cfg.d_kv)

        if self.has_rel_bias:
            rel = jnp.arange(s)[None, :] - jnp.arange(s)[:, None]
            buckets = _rel_bucket(rel, cfg.rel_buckets, cfg.rel_max_distance)
            table = nn.Embed(cfg.rel_buckets, cfg.n_heads, dtype=jnp.float32,
                             name="relative_attention_bias")
            pos_bias = table(buckets).transpose(2, 0, 1)[None]  # (1,H,S,S)

        # NOTE: T5 does NOT scale q @ k^T by 1/sqrt(d_kv)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        if pos_bias is not None:
            logits = logits + pos_bias
        logits = jnp.where(mask[:, None, None, :], logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                        name="o")(out), pos_bias


class T5FF(nn.Module):
    cfg: T5Config

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        if cfg.gated_ff:
            g = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                         name="wi_0")(x)
            u = nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                         name="wi_1")(x)
            h = nn.gelu(g, approximate=True) * u
        else:
            h = nn.relu(
                nn.Dense(cfg.d_ff, use_bias=False, dtype=cfg.dtype,
                         name="wi")(x)
            )
        return nn.Dense(cfg.d_model, use_bias=False, dtype=cfg.dtype,
                        name="wo")(h)


class T5Encoder(nn.Module):
    """Encoder-only T5; returns last hidden state with padded positions
    zeroed (t5_text_encoder.py:75-80 semantics)."""

    cfg: T5Config

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        cfg = self.cfg
        if attention_mask is None:
            attention_mask = jnp.ones_like(input_ids, dtype=bool)
        mask = attention_mask.astype(bool)
        x = nn.Embed(cfg.vocab_size, cfg.d_model, dtype=cfg.dtype,
                     name="shared")(input_ids)
        pos_bias = None
        for i in range(cfg.n_layers):
            h = T5LayerNorm(cfg.layer_norm_eps, cfg.dtype,
                            name=f"block_{i}_ln0")(x)
            attn, pos_bias = T5SelfAttention(
                cfg, has_rel_bias=(i == 0), name=f"block_{i}_attn"
            )(h, mask, pos_bias)
            x = x + attn
            h = T5LayerNorm(cfg.layer_norm_eps, cfg.dtype,
                            name=f"block_{i}_ln1")(x)
            x = x + T5FF(cfg, name=f"block_{i}_ff")(h)
        x = T5LayerNorm(cfg.layer_norm_eps, cfg.dtype,
                        name="final_layer_norm")(x)
        return x * mask[..., None].astype(x.dtype)


def convert_t5_encoder(sd: Mapping[str, np.ndarray], cfg: T5Config) -> dict:
    """HF T5EncoderModel state dict -> T5Encoder params."""

    def t(k):
        return np.ascontiguousarray(np.transpose(np.asarray(sd[k])))

    p: dict = {
        "shared": {"embedding": np.asarray(sd["shared.weight"])},
        "final_layer_norm": {
            "weight": np.asarray(sd["encoder.final_layer_norm.weight"])
        },
    }
    for i in range(cfg.n_layers):
        r = f"encoder.block.{i}.layer."
        attn = {
            n: {"kernel": t(f"{r}0.SelfAttention.{n}.weight")}
            for n in ("q", "k", "v", "o")
        }
        if i == 0:
            attn["relative_attention_bias"] = {
                "embedding": np.asarray(
                    sd[f"{r}0.SelfAttention.relative_attention_bias.weight"]
                )
            }
        p[f"block_{i}_attn"] = attn
        p[f"block_{i}_ln0"] = {
            "weight": np.asarray(sd[f"{r}0.layer_norm.weight"])
        }
        if cfg.gated_ff:
            ff = {
                "wi_0": {"kernel": t(f"{r}1.DenseReluDense.wi_0.weight")},
                "wi_1": {"kernel": t(f"{r}1.DenseReluDense.wi_1.weight")},
                "wo": {"kernel": t(f"{r}1.DenseReluDense.wo.weight")},
            }
        else:
            ff = {
                "wi": {"kernel": t(f"{r}1.DenseReluDense.wi.weight")},
                "wo": {"kernel": t(f"{r}1.DenseReluDense.wo.weight")},
            }
        p[f"block_{i}_ff"] = ff
        p[f"block_{i}_ln1"] = {
            "weight": np.asarray(sd[f"{r}1.layer_norm.weight"])
        }
    return p
