"""SigLIP vision tower + video safety classifier in Flax.

Rebuild of the Cosmos video-content-safety filter's models
(cosmos1/models/guardrail/video_content_safety_filter/vision_encoder.py
SigLIPEncoder — a transformers SiglipVisionModel — and model.py
SafetyClassifier:29-46). Converters consume transformers Siglip /
safety_filter.pt state dicts; exact-parity tests vs transformers live in
tests/test_guardrail_models.py.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SiglipVisionConfig", "SiglipVisionTower", "convert_siglip_vision",
    "SafetyClassifier", "convert_safety_classifier",
]


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    image_size: int = 384
    patch_size: int = 14
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    intermediate_size: int = 4304
    dtype: Any = jnp.float32

    @staticmethod
    def so400m() -> "SiglipVisionConfig":
        """google/siglip-so400m-patch14-384 (the Cosmos guardrail encoder)."""
        return SiglipVisionConfig()

    @staticmethod
    def tiny() -> "SiglipVisionConfig":
        return SiglipVisionConfig(image_size=28, patch_size=14, hidden_size=32,
                                  num_layers=2, num_heads=2,
                                  intermediate_size=64)


def _gelu_tanh(x):
    return nn.gelu(x, approximate=True)


class _SiglipLayer(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.hidden_size
        hd = d // c.num_heads
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm1")(x)
        b, s, _ = h.shape
        q = nn.Dense(d, name="q_proj")(h).reshape(b, s, c.num_heads, hd)
        k = nn.Dense(d, name="k_proj")(h).reshape(b, s, c.num_heads, hd)
        v = nn.Dense(d, name="v_proj")(h).reshape(b, s, c.num_heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, d)
        x = x + nn.Dense(d, name="out_proj")(o)
        h = nn.LayerNorm(epsilon=1e-6, name="layer_norm2")(x)
        h = nn.Dense(c.intermediate_size, name="fc1")(h)
        h = _gelu_tanh(h)
        h = nn.Dense(d, name="fc2")(h)
        return x + h


class SiglipVisionTower(nn.Module):
    """__call__(images (B, H, W, 3) normalized to [-1, 1]) -> pooled
    features (B, hidden) — SiglipVisionModel's pooler_output (what
    `get_image_features` returns for the vision side)."""

    config: SiglipVisionConfig = SiglipVisionConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        c = self.config
        b = images.shape[0]
        x = nn.Conv(c.hidden_size, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), padding="VALID",
                    name="patch_embedding")(images)
        x = x.reshape(b, -1, c.hidden_size)
        n_pos = (c.image_size // c.patch_size) ** 2
        pos = self.param("position_embedding", nn.initializers.zeros,
                         (n_pos, c.hidden_size))
        x = x + pos[None]
        for i in range(c.num_layers):
            x = _SiglipLayer(c, name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="post_layernorm")(x)

        # MultiheadAttentionPoolingHead: probe query cross-attends the
        # sequence, then LN + MLP with residual; output token 0
        d = c.hidden_size
        hd = d // c.num_heads
        probe = self.param("probe", nn.initializers.zeros, (1, 1, d))
        q = nn.Dense(d, name="head_q")(jnp.broadcast_to(probe, (b, 1, d)))
        k = nn.Dense(d, name="head_k")(x)
        v = nn.Dense(d, name="head_v")(x)
        s = x.shape[1]
        q = q.reshape(b, 1, c.num_heads, hd)
        k = k.reshape(b, s, c.num_heads, hd)
        v = v.reshape(b, s, c.num_heads, hd)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        o = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, 1, d)
        h = nn.Dense(d, name="head_out")(o)
        residual = h
        h = nn.LayerNorm(epsilon=1e-6, name="head_layernorm")(h)
        h = nn.Dense(c.intermediate_size, name="head_fc1")(h)
        h = _gelu_tanh(h)
        h = nn.Dense(d, name="head_fc2")(h)
        return (residual + h)[:, 0]


def convert_siglip_vision(sd: Mapping[str, np.ndarray]) -> dict:
    """transformers SiglipVisionModel state dict -> params."""
    p: dict = {}

    def put(path, v):
        node = p
        parts = path.split("/")
        for q in parts[:-1]:
            node = node.setdefault(q, {})
        node[parts[-1]] = np.asarray(v)

    def lin(v):
        return np.transpose(np.asarray(v))

    pre = "vision_model."
    for k, v in sd.items():
        k = k[len(pre):] if k.startswith(pre) else k
        if k == "embeddings.patch_embedding.weight":
            put("patch_embedding/kernel", np.transpose(v, (2, 3, 1, 0)))
        elif k == "embeddings.patch_embedding.bias":
            put("patch_embedding/bias", v)
        elif k == "embeddings.position_embedding.weight":
            put("position_embedding", v)
        elif k in ("post_layernorm.weight", "post_layernorm.bias"):
            put(f"post_layernorm/{'scale' if k.endswith('weight') else 'bias'}", v)
        elif m := re.fullmatch(r"encoder\.layers\.(\d+)\.(.+)\.(weight|bias)", k):
            i, rest, wb = m.groups()
            names = {"layer_norm1": "layer_norm1", "layer_norm2": "layer_norm2",
                     "self_attn.q_proj": "q_proj", "self_attn.k_proj": "k_proj",
                     "self_attn.v_proj": "v_proj",
                     "self_attn.out_proj": "out_proj",
                     "mlp.fc1": "fc1", "mlp.fc2": "fc2"}
            name = names[rest]
            if name.startswith("layer_norm"):
                put(f"layer_{i}/{name}/{'scale' if wb == 'weight' else 'bias'}", v)
            else:
                put(f"layer_{i}/{name}/{'kernel' if wb == 'weight' else 'bias'}",
                    lin(v) if wb == "weight" else v)
        elif k == "head.probe":
            put("probe", v)
        elif k == "head.attention.in_proj_weight":
            d = v.shape[1]
            put("head_q/kernel", lin(v[:d]))
            put("head_k/kernel", lin(v[d : 2 * d]))
            put("head_v/kernel", lin(v[2 * d :]))
        elif k == "head.attention.in_proj_bias":
            d = v.shape[0] // 3
            put("head_q/bias", v[:d])
            put("head_k/bias", v[d : 2 * d])
            put("head_v/bias", v[2 * d :])
        elif k == "head.attention.out_proj.weight":
            put("head_out/kernel", lin(v))
        elif k == "head.attention.out_proj.bias":
            put("head_out/bias", v)
        elif k in ("head.layernorm.weight", "head.layernorm.bias"):
            put(f"head_layernorm/{'scale' if k.endswith('weight') else 'bias'}", v)
        elif m := re.fullmatch(r"head\.mlp\.(fc[12])\.(weight|bias)", k):
            put(f"head_{m.group(1)}/{'kernel' if m.group(2) == 'weight' else 'bias'}",
                lin(v) if m.group(2) == "weight" else v)
        else:
            raise KeyError(f"unmatched siglip key {k}")
    return {"params": p}


class SafetyClassifier(nn.Module):
    """Linear-BN-ReLU x2 + Linear logits head (model.py:29-46); BatchNorm
    folded to eval-mode affine."""

    input_size: int = 1152
    num_classes: int = 7

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, width in enumerate((512, 256)):
            x = nn.Dense(width, name=f"linear_{i}")(x)
            scale = self.param(f"bn_{i}_scale", nn.initializers.ones, (width,))
            bias = self.param(f"bn_{i}_bias", nn.initializers.zeros, (width,))
            x = x * scale + bias
            x = nn.relu(x)
        return nn.Dense(self.num_classes, name="logits")(x)


def convert_safety_classifier(sd: Mapping[str, np.ndarray],
                              eps: float = 1e-5) -> dict:
    """safety_filter.pt ('network.layers.N.*') -> params, folding the
    BatchNorm running stats into affine scale/bias."""
    sd = {k[len("network."):] if k.startswith("network.") else k: np.asarray(v)
          for k, v in sd.items()}
    sd = {k[len("layers."):] if k.startswith("layers.") else k: v
          for k, v in sd.items()}
    p: dict = {}
    for i, (lin_i, bn_i) in enumerate(((0, 1), (3, 4))):
        p[f"linear_{i}"] = {"kernel": np.transpose(sd[f"{lin_i}.weight"]),
                            "bias": sd[f"{lin_i}.bias"]}
        gamma, beta = sd[f"{bn_i}.weight"], sd[f"{bn_i}.bias"]
        mean, var = sd[f"{bn_i}.running_mean"], sd[f"{bn_i}.running_var"]
        scale = gamma / np.sqrt(var + eps)
        p[f"bn_{i}_scale"] = scale.astype(np.float32)
        p[f"bn_{i}_bias"] = (beta - mean * scale).astype(np.float32)
    p["logits"] = {"kernel": np.transpose(sd["6.weight"]), "bias": sd["6.bias"]}
    return {"params": p}


# SigLIP image normalization (SiglipProcessor: rescale + [-1, 1])
def preprocess_siglip(frames: np.ndarray, image_size: int = 384) -> np.ndarray:
    """frames (N, H, W, 3) [0,1] -> resized, [-1,1] normalized."""
    import cv2

    out = np.stack([
        cv2.resize(f, (image_size, image_size), interpolation=cv2.INTER_CUBIC)
        for f in frames
    ])
    return (out * 2.0 - 1.0).astype(np.float32)
