"""Pixtral VLM prompt upsampler: vision transformer + multimodal projector
+ AR decoder assembly + chat templating.

Rebuild of the HOT cross-model boundary (SURVEY §3.5): TC-Light calls the
Pixtral-12B VLM once per video to write an edit prompt from the last frame
(cosmos1/models/diffusion/prompt_upsampler/
video2world_prompt_upsampler_inference.py:37-114 — prepare_dialog builds
"[IMG]\\n<instruction>" from the last frame; run_chat_completion decodes
<=400 tokens at temperature 0.01 / top_p 0.9).

Components:
- `PixtralViT`: patch-conv embed + 2D RoPE attention blocks
  (cosmos1/models/autoregressive/networks/vit.py:96-410),
- `MultimodalProjector` (modules/mm_projector.py:109),
- `PixtralVLM.embed_vision_language`: scatter image embeddings into the
  token stream at [IMG] positions (model.py embed_vision_language_features
  :513-572),
- `upsample_prompt_from_frames`: the end-user entry the Generator calls.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.ar_transformer import (
    ARConfig,
    ARGenerator,
    RMSNorm,
    SwiGLUMLP,
    Transformer,
    apply_rope,
    rope_frequencies,
)

UPSAMPLER_INSTRUCTION = (
    "Describe the lighting, materials, and atmosphere of this video frame "
    "in one detailed caption suitable as an image-relighting prompt."
)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 1024
    patch_size: int = 16
    dim: int = 1024
    n_layers: int = 24
    n_heads: int = 16
    ffn_hidden: int = 4096
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    dtype: Any = jnp.float32

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(image_size=64, patch_size=16, dim=64, n_layers=2,
                         n_heads=4, ffn_hidden=128)


class ViTAttention2DRoPE(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, rope_2d):
        cfg = self.cfg
        hd = cfg.dim // cfg.n_heads
        b, s, _ = x.shape
        q = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="wq")(x)
        k = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="wk")(x)
        v = nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="wv")(x)
        q = q.reshape(b, s, cfg.n_heads, hd)
        k = k.reshape(b, s, cfg.n_heads, hd)
        v = v.reshape(b, s, cfg.n_heads, hd)
        # 2D rope: first half of head dim rotates with row position, second
        # half with column position (vit.py 2D rope)
        half = hd // 2
        rope_r, rope_c, pos_r, pos_c = rope_2d
        q = jnp.concatenate([
            apply_rope(q[..., :half], rope_r, pos_r),
            apply_rope(q[..., half:], rope_c, pos_c),
        ], axis=-1)
        k = jnp.concatenate([
            apply_rope(k[..., :half], rope_r, pos_r),
            apply_rope(k[..., half:], rope_c, pos_c),
        ], axis=-1)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        probs = jax.nn.softmax(logits, axis=-1).astype(cfg.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, cfg.dim)
        return nn.Dense(cfg.dim, use_bias=False, dtype=cfg.dtype, name="wo")(out)


class PixtralViT(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images (B, H, W, 3) in [0, 1] -> patch features (B, S, dim)."""
        cfg = self.cfg
        p = cfg.patch_size
        x = nn.Conv(cfg.dim, (p, p), strides=(p, p), use_bias=False,
                    dtype=cfg.dtype, name="patch_conv")(images)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, cfg.dim)
        x = RMSNorm(cfg.norm_eps, cfg.dtype, name="ln_pre")(x)

        hd = cfg.dim // cfg.n_heads
        half = hd // 2
        max_grid = cfg.image_size // p
        rope_r = rope_frequencies(half, max_grid, cfg.rope_theta)
        rope_c = rope_frequencies(half, max_grid, cfg.rope_theta)
        rows = jnp.repeat(jnp.arange(gh), gw)
        cols = jnp.tile(jnp.arange(gw), gh)
        rope_2d = (rope_r, rope_c, rows, cols)

        ar_like = ARConfig(dim=cfg.dim, ffn_hidden=cfg.ffn_hidden,
                           dtype=cfg.dtype, norm_eps=cfg.norm_eps)
        for i in range(cfg.n_layers):
            h = ViTAttention2DRoPE(cfg, name=f"layers_{i}_attention")(
                RMSNorm(cfg.norm_eps, cfg.dtype, name=f"layers_{i}_attention_norm")(x),
                rope_2d,
            )
            x = x + h
            x = x + SwiGLUMLP(ar_like, name=f"layers_{i}_feed_forward")(
                RMSNorm(cfg.norm_eps, cfg.dtype, name=f"layers_{i}_ffn_norm")(x)
            )
        return x


class MultimodalProjector(nn.Module):
    """2-layer MLP vision->text embedding projector
    (mm_projector.py 'mlp' variant)."""

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="w_in")(x)
        # exact (erf) GELU: torch nn.GELU default (mm_projector.py:96)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="w_out")(x)


@dataclasses.dataclass
class PixtralVLM:
    """Assembled VLM: text decoder + ViT + projector."""

    text: Transformer
    text_params: Any
    vit: PixtralViT
    vit_params: Any
    projector: MultimodalProjector
    proj_params: Any
    cfg: ARConfig
    image_token_id: int = 10

    def embed_vision_language(self, token_ids: np.ndarray,
                              image: jnp.ndarray) -> jnp.ndarray:
        """Replace [IMG] token positions with projected patch features
        (model.py:513-572). token_ids must contain exactly S_img image
        tokens where S_img = ViT patch count."""
        feats = self.vit.apply(self.vit_params, image)
        feats = self.projector.apply(self.proj_params, feats)  # (1, S_img, D)
        tok_emb = self.text.apply(
            self.text_params, jnp.asarray(token_ids), method=Transformer.embed
        )
        is_img = jnp.asarray(token_ids) == self.image_token_id
        n_img = int(np.asarray(is_img).sum())
        assert n_img == feats.shape[1], (
            f"{n_img} [IMG] tokens vs {feats.shape[1]} patches"
        )
        img_positions = np.nonzero(np.asarray(is_img)[0])[0]
        emb = tok_emb.at[0, jnp.asarray(img_positions)].set(feats[0].astype(tok_emb.dtype))
        return emb

    def chat_completion(self, token_ids: np.ndarray, image: jnp.ndarray,
                        max_gen_len: int = 400, temperature: float = 0.01,
                        top_p: float = 0.9, stop_tokens=(2,), seed: int = 0
                        ) -> np.ndarray:
        emb = self.embed_vision_language(token_ids, image)
        gen = ARGenerator(self.text, self.text_params, self.cfg)
        return gen.generate(
            prompt_embeddings=emb, max_gen_len=max_gen_len,
            temperature=temperature, top_p=top_p, stop_tokens=tuple(stop_tokens),
            key=jax.random.PRNGKey(seed),
        )


def build_tiny_vlm(seed: int = 0) -> PixtralVLM:
    """Random-weight tiny VLM for tests."""
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    acfg = ARConfig.tiny()
    text = Transformer(acfg)
    text_params = text.init(k1, tokens=jnp.zeros((1, 8), jnp.int32))
    vcfg = ViTConfig.tiny()
    vit = PixtralViT(vcfg)
    vit_params = vit.init(k2, jnp.zeros((1, 64, 64, 3)))
    proj = MultimodalProjector(acfg.dim)
    proj_params = proj.init(k3, jnp.zeros((1, 16, vcfg.dim)))
    return PixtralVLM(text, text_params, vit, vit_params, proj, proj_params, acfg)


def prepare_dialog_tokens(tokenizer, n_image_tokens: int,
                          instruction: str = UPSAMPLER_INSTRUCTION,
                          image_token_id: int = 10) -> np.ndarray:
    """'[IMG]...\\n<instruction>' prompt layout (prepare_dialog,
    video2world_prompt_upsampler_inference.py:74-96)."""
    ids = tokenizer(instruction, truncation=False,
                    add_special_tokens=False)["input_ids"]
    bos = getattr(tokenizer, "bos_token_id", 1)
    return np.asarray([[bos] + [image_token_id] * n_image_tokens + ids], np.int32)


def load_vlm(ckpt_dir, cfg: ARConfig | None = None,
             vit_cfg: "ViTConfig | None" = None) -> PixtralVLM:
    """Load a Pixtral VLM from a local checkpoint dir.

    Accepts either layout (converted on the fly; models/convert_ar.py):
    - cosmos-native `model.pt` (the artifact the reference's
      convert_pixtral_ckpt.py produces and model.py:219-299 consumes);
    - HF hub safetensors (mistral-community/pixtral-12b style keys).
    """
    from pathlib import Path

    from tclight_tpu.models.convert_ar import (
        convert_vlm_checkpoint, from_hf_pixtral)

    cfg = cfg or ARConfig.pixtral_12b()
    vit_cfg = vit_cfg or ViTConfig()
    ckpt_dir = Path(ckpt_dir)
    ckpt: dict = {}
    pt = ckpt_dir / "model.pt"
    sts = sorted(ckpt_dir.glob("*.safetensors"))
    if pt.exists():
        import torch

        raw = torch.load(pt, map_location="cpu", mmap=True, weights_only=True)
        raw = raw.get("model", raw) if isinstance(raw, dict) else raw
        ckpt = {k: v.float().numpy() if hasattr(v, "numpy") else v
                for k, v in raw.items()}
    elif sts:
        from safetensors.numpy import load_file

        for f in sts:
            ckpt.update(load_file(str(f)))
    else:
        raise FileNotFoundError(f"no model.pt or *.safetensors in {ckpt_dir}")

    if any(k.startswith(("language_model.", "vision_tower.")) for k in ckpt):
        ckpt = from_hf_pixtral(
            ckpt, llm_heads=cfg.n_heads, llm_kv_heads=cfg.n_kv_heads,
            vit_heads=vit_cfg.n_heads,
        )
    llm_p, vit_p, proj_p = convert_vlm_checkpoint(
        ckpt, llm_layers=cfg.n_layers, vit_layers=vit_cfg.n_layers
    )
    return PixtralVLM(
        Transformer(cfg), {"params": llm_p},
        PixtralViT(vit_cfg), {"params": vit_p},
        MultimodalProjector(cfg.dim), {"params": proj_p},
        cfg,
    )


def upsample_prompt_from_frames(ckpt_dir, frames: np.ndarray,
                                max_gen_len: int = 400) -> str:
    """Generator hook: last frame -> upsampled prompt (generate.py:536-547,
    run_chat_completion w/ temperature 0.01, top_p 0.9). Requires local
    Pixtral checkpoints + a HF tokenizer under `ckpt_dir`."""
    from transformers import AutoTokenizer

    vlm = load_vlm(ckpt_dir)
    tokenizer = AutoTokenizer.from_pretrained(str(ckpt_dir))
    img = frames[-1]
    if img.dtype != np.float32:
        img = img.astype(np.float32) / 255.0
    # long side <= 1024 (prepare_dialog, :74-96)
    import cv2

    h, w = img.shape[:2]
    scale = 1024 / max(h, w)
    if scale < 1.0:
        img = cv2.resize(img, (int(w * scale), int(h * scale)))
    p = 16
    img = img[: img.shape[0] // p * p, : img.shape[1] // p * p]
    n_patches = (img.shape[0] // p) * (img.shape[1] // p)
    ids = prepare_dialog_tokens(tokenizer, n_patches)
    out = vlm.chat_completion(
        ids, jnp.asarray(img[None]), max_gen_len=max_gen_len,
        temperature=0.01, top_p=0.9,
        stop_tokens=(tokenizer.eos_token_id or 2,),
    )
    return tokenizer.decode([t for t in np.asarray(out).tolist()
                             if t != tokenizer.eos_token_id])
