"""AR model-config factories + tokenizer wrappers.

Rebuild of cosmos1/models/autoregressive/configs/ (arch tables
:33-85 and the factories `create_text_model_config` model_config.py:154,
`create_vision_language_model_config` :216, `create_video2world_model_config`
:284) and the tokenizer stack interfaces
(tokenizer/text_tokenizer.py:317, image_text_tokenizer.py:318,
tokenizer.py DiscreteMultimodalTokenizer :322).

Model sizes map onto `ARConfig` (models/ar_transformer.py); tokenizers wrap
local transformers checkpoints (zero-egress: nothing downloads).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import numpy as np

from tclight_tpu.models.ar_transformer import ARConfig

# ---------------------------------------------------------------- arch table

_ARCHS: dict[str, dict] = {
    # Cosmos AR world models
    "cosmos-4b": dict(dim=3072, n_layers=16, n_heads=32, n_kv_heads=8,
                      ffn_hidden=8192, vocab_size=64064),
    "cosmos-12b": dict(dim=5120, n_layers=40, n_heads=32, n_kv_heads=8,
                       ffn_hidden=14336, vocab_size=64064),
    # text models
    "llama3-8b": dict(dim=4096, n_layers=32, n_heads=32, n_kv_heads=8,
                      ffn_hidden=14336, vocab_size=128256,
                      rope_theta=500000.0),
    "mistral-12b": dict(dim=5120, n_layers=40, n_heads=32, n_kv_heads=8,
                        head_dim=128, ffn_hidden=14336, vocab_size=131072,
                        rope_theta=1e9),
    "pixtral-12b": dict(dim=5120, n_layers=40, n_heads=32, n_kv_heads=8,
                        head_dim=128, ffn_hidden=14336, vocab_size=131072,
                        rope_theta=1e9),
}


def create_text_model_config(
    model_family: str = "mistral", model_size: str = "12b",
    max_seq_len: int = 4096, **overrides: Any,
) -> ARConfig:
    """Text-only AR config (model_config.py:154-214)."""
    key = f"{model_family}-{model_size}"
    if key not in _ARCHS:
        raise KeyError(f"unknown arch {key}; known: {sorted(_ARCHS)}")
    kw = dict(_ARCHS[key])
    kw.update(overrides)
    return ARConfig(max_seq_len=max_seq_len, **kw)


def create_vision_language_model_config(
    model_family: str = "pixtral", model_size: str = "12b",
    max_seq_len: int = 4300, **overrides: Any,
) -> ARConfig:
    """VLM text-decoder config (model_config.py:216-282); the vision tower
    is models/pixtral.ViTConfig."""
    return create_text_model_config(model_family, model_size, max_seq_len,
                                    **overrides)


def create_video2world_model_config(
    model_size: str = "5b", max_seq_len: int = 12864,
    cross_dim: int = 1024, **overrides: Any,
) -> ARConfig:
    """Video2world AR config with T5 cross-attention on every 4th layer
    (model_config.py:284-350)."""
    base = "cosmos-4b" if model_size in ("4b", "5b") else "cosmos-12b"
    kw = dict(_ARCHS[base])
    kw.update(overrides)
    cfg = ARConfig(max_seq_len=max_seq_len, cross_dim=cross_dim, **kw)
    n = cfg.n_layers
    return dataclasses.replace(cfg, cross_attn_layers=tuple(range(0, n, 4)))


# ------------------------------------------------------------- tokenizers


class TextTokenizer:
    """HF chat-template text tokenizer wrapper (text_tokenizer.py:317)."""

    def __init__(self, ckpt_dir: str | Path):
        from transformers import AutoTokenizer

        self.tokenizer = AutoTokenizer.from_pretrained(str(ckpt_dir))

    def apply_chat_template(self, dialog: list[dict], add_generation_prompt=True):
        return self.tokenizer.apply_chat_template(
            dialog, add_generation_prompt=add_generation_prompt,
            return_tensors="np",
        )

    def encode(self, text: str) -> list[int]:
        return self.tokenizer(text, add_special_tokens=False)["input_ids"]

    def decode(self, ids) -> str:
        return self.tokenizer.decode(ids, skip_special_tokens=True)


class ImageTextTokenizer(TextTokenizer):
    """Pixtral processor wrapper: interleaves [IMG] tokens with text and
    prepares pixel values (image_text_tokenizer.py:318)."""

    image_token_id = 10

    def __init__(self, ckpt_dir: str | Path, patch_size: int = 16,
                 max_image_size: int = 1024):
        super().__init__(ckpt_dir)
        self.patch_size = patch_size
        self.max_image_size = max_image_size

    def prepare_image(self, image: np.ndarray) -> tuple[np.ndarray, int]:
        """Resize to <= max_image_size with patch-aligned dims; returns
        (image, n_image_tokens)."""
        import cv2

        h, w = image.shape[:2]
        scale = min(1.0, self.max_image_size / max(h, w))
        nh = max(self.patch_size, int(h * scale) // self.patch_size * self.patch_size)
        nw = max(self.patch_size, int(w * scale) // self.patch_size * self.patch_size)
        img = cv2.resize(image, (nw, nh))
        return img, (nh // self.patch_size) * (nw // self.patch_size)

    def encode_dialog_with_image(self, instruction: str, image: np.ndarray):
        img, n_tokens = self.prepare_image(image)
        text_ids = self.encode(instruction)
        bos = self.tokenizer.bos_token_id or 1
        ids = [bos] + [self.image_token_id] * n_tokens + text_ids
        return np.asarray([ids], np.int32), img[None]


@dataclasses.dataclass
class DiscreteMultimodalTokenizer:
    """Video BOV/EOV special-token wrapper around the FSQ video tokenizer
    (tokenizer.py:322): flattens latent-grid indices into the AR vocabulary
    with offsets + boundary tokens."""

    video_tokenizer: Any      # CausalDiscreteVideoTokenizer (module)
    params: Any
    text_vocab_size: int
    bov_token: int = 64000
    eov_token: int = 64001

    @property
    def video_vocab_offset(self) -> int:
        return self.text_vocab_size

    def tokenize_video(self, video: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        idx, _ = self.video_tokenizer.apply(
            self.params, jnp.asarray(video),
            method=type(self.video_tokenizer).encode,
        )
        flat = np.asarray(idx).reshape(idx.shape[0], -1) + self.video_vocab_offset
        b = flat.shape[0]
        bov = np.full((b, 1), self.bov_token + self.video_vocab_offset)
        eov = np.full((b, 1), self.eov_token + self.video_vocab_offset)
        return np.concatenate([bov, flat, eov], axis=1).astype(np.int64)

    def detokenize_video(self, tokens: np.ndarray, grid: tuple) -> np.ndarray:
        import jax.numpy as jnp

        body = tokens[:, 1:-1] - self.video_vocab_offset
        t, h, w = grid
        idx = body.reshape(-1, t, h, w)
        return np.asarray(self.video_tokenizer.apply(
            self.params, jnp.asarray(idx),
            method=type(self.video_tokenizer).decode_indices,
        ))
