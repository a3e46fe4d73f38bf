"""CLIP vision tower (ViT-B/32-class) + projection for evaluation metrics.

Rebuild of the CLIP image encoder evaluate.py loads for clip-frame /
clip-text scores (eval_utils.py:119-176; reference uses openai CLIP ViT-B/32
and PickScore's CLIP-H). Weights convert from a transformers
CLIPVisionModelWithProjection / CLIPModel state dict via
`convert_clip_vision`; the text side reuses models/clip_text.py plus the
text projection.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# openai CLIP normalization constants
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    projection_dim: int = 512
    dtype: Any = jnp.float32

    @staticmethod
    def vit_b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def vit_h14() -> "CLIPVisionConfig":
        """laion CLIP-ViT-H-14 vision tower (the PickScore_v1 backbone)."""
        return CLIPVisionConfig(
            image_size=224, patch_size=14, hidden_size=1280, num_layers=32,
            num_heads=16, intermediate_size=5120, projection_dim=1024,
        )

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                                num_layers=2, num_heads=2,
                                intermediate_size=64, projection_dim=16)


class _VisionLayer(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        h = cfg.num_heads
        d = cfg.hidden_size // h
        b, s, _ = x.shape
        z = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm1")(x)
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="q_proj")(z)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="k_proj")(z)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="v_proj")(z)
        q = q.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, h, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(d)
        probs = jax.nn.softmax(logits, -1).astype(cfg.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, s, cfg.hidden_size)
        x = x + nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="out_proj")(o)
        z = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="layer_norm2")(x)
        z = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="mlp_fc1")(z)
        z = z * jax.nn.sigmoid(1.702 * z)  # quick_gelu
        z = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="mlp_fc2")(z)
        return x + z


class CLIPVisionModel(nn.Module):
    """(B, H, W, 3) in [0,1] -> projected embedding (B, projection_dim)."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images):
        cfg = self.cfg
        x = (images - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)
        p = cfg.patch_size
        z = nn.Conv(cfg.hidden_size, (p, p), strides=(p, p), use_bias=False,
                    dtype=cfg.dtype, name="patch_embedding")(x)
        b, gh, gw, _ = z.shape
        z = z.reshape(b, gh * gw, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        z = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)), z], 1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            ((cfg.image_size // p) ** 2 + 1, cfg.hidden_size),
        )
        z = z + pos[None, : z.shape[1]]
        z = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="pre_layrnorm")(z)
        for i in range(cfg.num_layers):
            z = _VisionLayer(cfg, name=f"layers_{i}")(z)
        pooled = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype,
                              name="post_layernorm")(z[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, dtype=cfg.dtype,
                        name="visual_projection")(pooled)


def convert_clip_vision(sd: dict) -> dict:
    """transformers CLIPVisionModelWithProjection (or the vision half of
    CLIPModel) -> our params."""
    import re

    params: dict = {}

    def put(path, val):
        node = params
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def strip(k):
        for pre in ("vision_model.", "clip.vision_model."):
            if k.startswith(pre):
                return k[len(pre):]
        return k

    for k, v in sd.items():
        v = np.asarray(v)
        if "position_ids" in k:
            continue
        if k == "visual_projection.weight":
            put("visual_projection/kernel", v.T)
            continue
        k = strip(k)
        if k == "embeddings.class_embedding":
            put("class_embedding", v)
        elif k == "embeddings.position_embedding.weight":
            put("position_embedding", v)
        elif k == "embeddings.patch_embedding.weight":
            put("patch_embedding/kernel", np.transpose(v, (2, 3, 1, 0)))
        elif k.startswith("pre_layrnorm") or k.startswith("post_layernorm"):
            name, leaf = k.split(".")
            put(f"{name}/{'scale' if leaf == 'weight' else 'bias'}", v)
        else:
            m = re.fullmatch(
                r"encoder\.layers\.(\d+)\.(self_attn\.(q|k|v|out)_proj|"
                r"layer_norm[12]|mlp\.fc[12])\.(weight|bias)", k)
            if not m:
                continue
            i, mod, leaf = m.group(1), m.group(2), m.group(4)
            if mod.startswith("self_attn."):
                name = mod.split(".")[1]
                put(f"layers_{i}/{name}/" +
                    ("kernel" if leaf == "weight" else "bias"),
                    v.T if leaf == "weight" else v)
            elif mod.startswith("layer_norm"):
                put(f"layers_{i}/{mod}/{'scale' if leaf == 'weight' else 'bias'}", v)
            else:
                name = "mlp_fc1" if mod.endswith("1") else "mlp_fc2"
                put(f"layers_{i}/{name}/" +
                    ("kernel" if leaf == "weight" else "bias"),
                    v.T if leaf == "weight" else v)
    return {"params": params}


def make_clip_embed_fn(vision_model, vision_params, text_model=None,
                       text_params=None, text_projection=None, tokenizer=None,
                       image_size: int = 224):
    """Build the (frames, prompt) -> (image_embs, text_emb) callable the
    evaluate CLI plugs in."""
    import cv2

    fn = jax.jit(lambda x: vision_model.apply(vision_params, x))

    def embed(frames: np.ndarray, prompt: str):
        resized = np.stack([
            cv2.resize(f, (image_size, image_size)) for f in frames
        ])
        embs = np.asarray(fn(jnp.asarray(resized)))
        temb = None
        if text_model is not None and prompt:
            ids = tokenizer(prompt, truncation=True, max_length=77,
                            add_special_tokens=False)["input_ids"]
            ids = [tokenizer.bos_token_id] + ids + [tokenizer.eos_token_id]
            ids = ids + [tokenizer.eos_token_id] * (77 - len(ids))
            hidden = text_model.apply(text_params, jnp.asarray([ids], jnp.int32))
            eos_pos = len([i for i in ids if i != tokenizer.eos_token_id])
            pooled = hidden[0, min(eos_pos, 76)]
            temb = np.asarray(pooled @ text_projection) if text_projection is not None else np.asarray(pooled)
        return embs, temb

    return embed
