"""T5-11B text encoder wrapper (CosmosT5TextEncoder,
cosmos1/models/common/t5_text_encoder.py:27).

Thin wrapper over transformers' torch T5EncoderModel loaded from a LOCAL
checkpoint directory (zero-egress). Output features feed the DiT
cross-attention (context_dim 1024). Runs the encoder on CPU via torch and
ships embeddings to device — text encoding is a one-shot preprocessing
step, not a hot loop, so a JAX port is not on the critical path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

__all__ = ["T5TextEncoder"]


class T5TextEncoder:
    def __init__(self, ckpt_dir: str | Path, max_length: int = 512):
        from transformers import T5EncoderModel, T5TokenizerFast

        self.tokenizer = T5TokenizerFast.from_pretrained(str(ckpt_dir))
        self.model = T5EncoderModel.from_pretrained(str(ckpt_dir)).eval()
        self.max_length = max_length

    def encode_prompts(self, prompts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """-> (embeddings (B, L, D), attention mask (B, L)); padded token
        embeddings are zeroed, as the reference does."""
        import torch

        batch = self.tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=self.max_length, return_tensors="pt",
        )
        with torch.no_grad():
            out = self.model(
                input_ids=batch.input_ids, attention_mask=batch.attention_mask
            ).last_hidden_state
        emb = out.numpy() * batch.attention_mask.numpy()[..., None]
        return emb, batch.attention_mask.numpy()
