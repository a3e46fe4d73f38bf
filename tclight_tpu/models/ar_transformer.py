"""Autoregressive transformer (Llama/Mistral/Pixtral family) with KV-cache
decoding — TPU-native rebuild of the vendored Cosmos AR stack.

Covers (SURVEY §2.6 HOT rows):
- GQA attention with a static KV cache
  (cosmos1/models/autoregressive/modules/attention.py:26-211),
- RMSNorm (modules/normalization.py), SwiGLU MLP (modules/mlp.py),
- rotary embeddings, llama3-style (modules/embedding.py RoPE v1; YaRN and
  3D-video variants are config hooks),
- TransformerBlock/Transformer with causal masking
  (networks/transformer.py:35-461),
- gpt-fast style generation: prefill + single-token decode loop with
  top-p/top-k sampling (utils/sampling.py:23-195; model.py generate :316).

TPU design: the decode loop is one `lax.scan` whose carry holds the KV
cache (static shapes); sampling is vectorized; the cache lives in HBM and
updates via dynamic_update_slice. Params shard tensor-parallel via
parallel/mesh.shard_params for the 12B configs.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.rope import RopeSpec, apply_rope_tables, build_rope_tables

Dtype = Any


@dataclasses.dataclass(frozen=True)
class ARConfig:
    vocab_size: int = 32000
    dim: int = 512
    n_layers: int = 4
    n_heads: int = 8
    n_kv_heads: int = 8
    head_dim: Optional[int] = None
    ffn_hidden: int = 1024
    max_seq_len: int = 1024
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32
    # cross-attention (video2world variant) hooks
    cross_attn_layers: tuple = ()
    cross_dim: int = 0
    # full RoPE family (models/rope.py): None keeps the default V1 1D RoPE
    # at (rope_theta, max_seq_len); set for YaRN / RoPE v2 / 2D / 3D video
    rope_spec: Any = None

    @property
    def hd(self) -> int:
        return self.head_dim or self.dim // self.n_heads

    @staticmethod
    def tiny(vocab_size: int = 256) -> "ARConfig":
        return ARConfig(vocab_size=vocab_size, dim=64, n_layers=2, n_heads=4,
                        n_kv_heads=2, ffn_hidden=128, max_seq_len=128)

    @staticmethod
    def pixtral_12b() -> "ARConfig":
        """Pixtral-12B text decoder (model_config.py:216-283 arch table)."""
        return ARConfig(
            vocab_size=131072, dim=5120, n_layers=40, n_heads=32,
            n_kv_heads=8, head_dim=128, ffn_hidden=14336, max_seq_len=4300,
            rope_theta=1e9, dtype=jnp.bfloat16,
        )


class RMSNorm(nn.Module):
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        out = x * jax.lax.rsqrt(var + self.eps).astype(x.dtype)
        return out * scale.astype(x.dtype)


@functools.lru_cache(maxsize=8)
def _rope_tables_for(cfg: "ARConfig"):
    """(L, D, 2) cos/sin tables for the config's RoPE spec (the default
    spec reproduces the legacy V1 1D behavior bit-exactly — test_rope.py
    test_v1_1d_matches_legacy_apply)."""
    spec = cfg.rope_spec or RopeSpec(
        variant="v1", rope_dim="1D", theta=cfg.rope_theta,
        max_position_embeddings=cfg.max_seq_len,
    )
    return build_rope_tables(spec, cfg.hd, cfg.max_seq_len)


def rope_frequencies(head_dim: int, max_seq: int, theta: float) -> jnp.ndarray:
    """(max_seq, head_dim//2) complex rotation angles."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    t = np.arange(max_seq)
    freqs = np.outer(t, inv)
    return jnp.asarray(np.stack([np.cos(freqs), np.sin(freqs)], -1), jnp.float32)


def apply_rope(x: jnp.ndarray, rope: jnp.ndarray, positions: jnp.ndarray):
    """x: (B, S, H, D); rope: (max_seq, D/2, 2); positions: (S,) or (B, S).
    Llama-style interleaved pair rotation."""
    cs = rope[positions]  # (..., S, D/2, 2)
    if cs.ndim == 3:
        cs = cs[None]
    cos = cs[..., 0][:, :, None, :]
    sin = cs[..., 1][:, :, None, :]
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


class KVCache(NamedTuple):
    k: jnp.ndarray  # (B, max_seq, n_kv, hd)
    v: jnp.ndarray


def init_cache(cfg: ARConfig, batch: int) -> list[KVCache]:
    shape = (batch, cfg.max_seq_len, cfg.n_kv_heads, cfg.hd)
    return [
        KVCache(jnp.zeros(shape, cfg.dtype), jnp.zeros(shape, cfg.dtype))
        for _ in range(cfg.n_layers)
    ]


class GQAAttention(nn.Module):
    cfg: ARConfig

    @nn.compact
    def __call__(self, x, rope, positions, cache: KVCache | None, cur_len):
        cfg = self.cfg
        hd = cfg.hd
        b, s, _ = x.shape
        q = nn.Dense(cfg.n_heads * hd, use_bias=False, dtype=cfg.dtype,
                     name="wq")(x).reshape(b, s, cfg.n_heads, hd)
        k = nn.Dense(cfg.n_kv_heads * hd, use_bias=False, dtype=cfg.dtype,
                     name="wk")(x).reshape(b, s, cfg.n_kv_heads, hd)
        v = nn.Dense(cfg.n_kv_heads * hd, use_bias=False, dtype=cfg.dtype,
                     name="wv")(x).reshape(b, s, cfg.n_kv_heads, hd)
        variant = cfg.rope_spec.variant if cfg.rope_spec is not None else "v1"
        q = apply_rope_tables(q, rope, positions, variant)
        k = apply_rope_tables(k, rope, positions, variant)

        if cache is not None:
            # static-shape cache update at `cur_len` (attention.py:180-188)
            k_all = jax.lax.dynamic_update_slice(
                cache.k, k.astype(cache.k.dtype), (0, cur_len, 0, 0))
            v_all = jax.lax.dynamic_update_slice(
                cache.v, v.astype(cache.v.dtype), (0, cur_len, 0, 0))
            new_cache = KVCache(k_all, v_all)
            kv_len = cache.k.shape[1]
            key_pos = jnp.arange(kv_len)
        else:
            k_all, v_all = k, v
            new_cache = None
            kv_len = s
            key_pos = positions if positions.ndim == 1 else positions[0]

        rep = cfg.n_heads // cfg.n_kv_heads
        k_r = jnp.repeat(k_all, rep, axis=2)
        v_r = jnp.repeat(v_all, rep, axis=2)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k_r,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        q_pos = positions if positions.ndim == 1 else positions[0]
        mask = key_pos[None, :] <= q_pos[:, None]  # causal over absolute pos
        logits = jnp.where(mask[None, None], logits, -1e30)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v_r)
        out = out.reshape(b, s, cfg.n_heads * hd)
        return nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype,
                        name="wo")(out), new_cache


class SwiGLUMLP(nn.Module):
    cfg: ARConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        gate = nn.Dense(cfg.ffn_hidden, use_bias=False, dtype=cfg.dtype,
                        name="w1")(x)
        up = nn.Dense(cfg.ffn_hidden, use_bias=False, dtype=cfg.dtype,
                      name="w3")(x)
        return nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype,
                        name="w2")(nn.silu(gate) * up)


class TransformerBlock(nn.Module):
    cfg: ARConfig

    @nn.compact
    def __call__(self, x, rope, positions, cache, cur_len):
        cfg = self.cfg
        h, new_cache = GQAAttention(cfg, name="attention")(
            RMSNorm(cfg.norm_eps, cfg.dtype, name="attention_norm")(x),
            rope, positions, cache, cur_len,
        )
        x = x + h
        x = x + SwiGLUMLP(cfg, name="feed_forward")(
            RMSNorm(cfg.norm_eps, cfg.dtype, name="ffn_norm")(x)
        )
        return x, new_cache


class Transformer(nn.Module):
    """Decoder-only transformer; call with token ids OR precomputed
    embeddings (for VLM feature stitching, model.py:513-572)."""

    cfg: ARConfig

    def setup(self):
        cfg = self.cfg
        self.tok_embeddings = nn.Embed(cfg.vocab_size, cfg.dim, dtype=cfg.dtype)
        self.blocks = [
            TransformerBlock(cfg, name=f"layers_{i}") for i in range(cfg.n_layers)
        ]
        self.norm = RMSNorm(cfg.norm_eps, cfg.dtype)
        self.output = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype)

    def __call__(self, tokens=None, embeddings=None, caches=None, cur_len=0,
                 positions=None):
        cfg = self.cfg
        if embeddings is None:
            embeddings = self.tok_embeddings(tokens)
        x = embeddings
        s = x.shape[1]
        if positions is None:
            positions = jnp.arange(s) + cur_len
        rope = jnp.asarray(_rope_tables_for(cfg))
        new_caches = []
        for i, block in enumerate(self.blocks):
            cache = caches[i] if caches is not None else None
            x, nc = block(x, rope, positions, cache, cur_len)
            new_caches.append(nc)
        x = self.norm(x)
        logits = self.output(x)
        return logits.astype(jnp.float32), new_caches

    def embed(self, tokens):
        return self.tok_embeddings(tokens)


# ------------------------------------------------------------------ sampling


def sample_top_p(logits: jnp.ndarray, key, temperature: float = 1.0,
                 top_p: float = 0.9) -> jnp.ndarray:
    """Nucleus sampling (utils/sampling.py sample_top_p :23)."""
    if temperature <= 1e-5:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    sorted_probs = jax.nn.softmax(sorted_logits, axis=-1)
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    # keep tokens until cumulative prob exceeds top_p (always keep first)
    cutoff_mask = (cumsum - sorted_probs) > top_p
    sorted_logits = jnp.where(cutoff_mask, -jnp.inf, sorted_logits)
    # map the filter back: threshold = smallest kept logit
    kept_min = jnp.min(
        jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
    )
    filtered = jnp.where(logits >= kept_min, logits, -jnp.inf)
    return jax.random.categorical(key, filtered, axis=-1)


def sample_top_k(logits: jnp.ndarray, key, temperature: float = 1.0,
                 top_k: int = 50) -> jnp.ndarray:
    if temperature <= 1e-5:
        return jnp.argmax(logits, axis=-1)
    logits = logits / temperature
    kth = jnp.sort(logits, axis=-1)[..., -top_k][..., None]
    filtered = jnp.where(logits >= kth, logits, -jnp.inf)
    return jax.random.categorical(key, filtered, axis=-1)


class ARGenerator:
    """gpt-fast style prefill + scan decode (utils/sampling.py prefill :104,
    decode_n_tokens :144)."""

    def __init__(self, model: Transformer, params, cfg: ARConfig):
        self.model = model
        self.params = params
        self.cfg = cfg

    def generate(
        self,
        prompt_tokens: np.ndarray | None = None,
        prompt_embeddings: jnp.ndarray | None = None,
        max_gen_len: int = 100,
        temperature: float = 0.6,
        top_p: float = 0.9,
        stop_tokens: tuple = (),
        key=None,
    ) -> np.ndarray:
        cfg = self.cfg
        key = key if key is not None else jax.random.PRNGKey(0)
        if prompt_embeddings is not None:
            b, prompt_len = prompt_embeddings.shape[:2]
        else:
            prompt_tokens = jnp.asarray(prompt_tokens)
            b, prompt_len = prompt_tokens.shape
        caches = init_cache(cfg, b)

        # prefill
        logits, caches = self.model.apply(
            self.params,
            tokens=None if prompt_embeddings is not None else prompt_tokens,
            embeddings=prompt_embeddings,
            caches=caches, cur_len=0,
        )
        key, sub = jax.random.split(key)
        cur = sample_top_p(logits[:, -1], sub, temperature, top_p)

        @jax.jit
        def decode_step(carry, key_i):
            caches, cur, pos = carry
            logits, caches = self.model.apply(
                self.params, tokens=cur[:, None], caches=caches, cur_len=pos,
                positions=jnp.asarray([0]) + pos,
            )
            nxt = sample_top_p(logits[:, -1], key_i, temperature, top_p)
            return (caches, nxt, pos + 1), nxt

        keys = jax.random.split(key, max_gen_len - 1)
        (_, _, _), tokens = jax.lax.scan(
            decode_step, (caches, cur, jnp.asarray(prompt_len)), keys
        )
        out = jnp.concatenate([cur[:, None], tokens.T], axis=1)
        out_np = np.asarray(out)
        # trim at stop tokens (host-side, like the reference's stop check)
        if stop_tokens:
            for bi in range(b):
                for t, tok in enumerate(out_np[bi]):
                    if int(tok) in stop_tokens:
                        out_np = out_np[:, : t + 1] if b == 1 else out_np
                        break
                break
        return out_np
