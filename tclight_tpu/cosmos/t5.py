"""T5-11B text encoder wrapper (CosmosT5TextEncoder,
cosmos1/models/common/t5_text_encoder.py:27).

Loads a LOCAL HF T5 checkpoint directory (zero-egress), converts the
weights once (models/t5_encoder.convert_t5_encoder) and runs the jitted
Flax encoder — oracle-parity-tested vs transformers (tests/test_t5.py).
Output features feed the DiT cross-attention (context_dim 1024).
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tclight_tpu.models.t5_encoder import T5Config, T5Encoder, convert_t5_encoder

__all__ = ["T5TextEncoder"]


class T5TextEncoder:
    def __init__(self, ckpt_dir: str | Path, max_length: int = 512,
                 cfg: T5Config | None = None):
        from transformers import T5TokenizerFast

        ckpt_dir = Path(ckpt_dir)
        self.tokenizer = T5TokenizerFast.from_pretrained(str(ckpt_dir))
        self.max_length = max_length
        if cfg is None:
            hf = json.loads((ckpt_dir / "config.json").read_text())
            cfg = T5Config(
                vocab_size=hf["vocab_size"], d_model=hf["d_model"],
                d_kv=hf["d_kv"], d_ff=hf["d_ff"],
                n_layers=hf["num_layers"], n_heads=hf["num_heads"],
                rel_buckets=hf.get("relative_attention_num_buckets", 32),
                rel_max_distance=hf.get("relative_attention_max_distance", 128),
                gated_ff="gated" in hf.get("feed_forward_proj", "relu"),
            )
        self.cfg = cfg
        sd = self._load_state_dict(ckpt_dir)
        self.params = {"params": convert_t5_encoder(sd, cfg)}
        self.model = T5Encoder(cfg)
        self._encode = jax.jit(
            lambda p, ids, mask: self.model.apply(p, ids, mask)
        )

    @staticmethod
    def _load_state_dict(ckpt_dir: Path) -> dict:
        sts = sorted(ckpt_dir.glob("*.safetensors"))
        if sts:
            from safetensors.numpy import load_file

            sd: dict = {}
            for f in sts:
                sd.update(load_file(str(f)))
            return sd
        import torch

        bins = sorted(ckpt_dir.glob("pytorch_model*.bin"))
        if not bins:
            raise FileNotFoundError(f"no T5 weights in {ckpt_dir}")
        sd = {}
        for f in bins:
            raw = torch.load(f, map_location="cpu", weights_only=True)
            sd.update({k: v.float().numpy() for k, v in raw.items()})
        return sd

    def encode_prompts(self, prompts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """-> (embeddings (B, L, D), attention mask (B, L)); padded token
        embeddings are zeroed, as the reference does
        (t5_text_encoder.py:75-80)."""
        batch = self.tokenizer(
            prompts, padding="max_length", truncation=True,
            max_length=self.max_length, return_tensors="np",
        )
        out = self._encode(
            self.params,
            jnp.asarray(batch["input_ids"], jnp.int32),
            jnp.asarray(batch["attention_mask"], jnp.int32),
        )
        return np.asarray(out), np.asarray(batch["attention_mask"])
