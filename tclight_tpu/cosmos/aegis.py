"""Aegis text guardrail: LlamaGuard-7B + the Aegis-Defensive LoRA adapter.

Real port of the reference's last interface-only model family
(cosmos1/models/guardrail/aegis/aegis.py:40-130):

- `moderation_prompt` reproduces the reference's [INST] template byte-for
  byte (aegis.py:50-68), including its embedded 8-space indentation — the
  adapter was trained on exactly this surface form.
- `parse_block_message` reproduces the unsafe-category parse
  (aegis.py:70-84) *including its index arithmetic*: the O-code is
  mapped with ``int(code) - 1`` into the 11-element category list even
  though O9 is absent from the taxonomy, so O10/O11/O12 resolve one
  entry early (threat/profanity/out-of-range). Reference behavior, kept.
- `AegisLlamaGuard` runs the check on our own stack: HF LlamaGuard-7b
  weights + PEFT LoRA adapter are merged host-side
  (models/convert_ar.merge_lora) and converted into the repo's GQA
  Transformer (models/ar_transformer.py) — a Llama-2-7B instance — then
  greedily decoded (the reference's `model.generate` default) for up to
  100 new tokens.

Checkpoint layout expected in ``ckpt_dir`` (what a
`huggingface-cli download meta-llama/LlamaGuard-7b` +
`nvidia/Aegis-...-Defensive-1.0` pair gives locally):
  - base model safetensors/bin (HF LlamaForCausalLM keys) + config.json
  - tokenizer files readable by transformers AutoTokenizer
  - optional ``adapter_model.safetensors`` (+ ``adapter_config.json``)
    anywhere under the dir -> LoRA-merged before conversion
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from tclight_tpu.cosmos.aegis_data import UNSAFE_CATEGORIES

__all__ = ["UNSAFE_CATEGORIES", "moderation_prompt", "parse_block_message",
           "AegisLlamaGuard"]


def moderation_prompt(user_prompt: str) -> str:
    """The exact Aegis moderation prompt (reference aegis.py:50-68)."""
    full_prompt = f"""[INST] Task: Check if there is unsafe content in 'User' messages in conversations according our safety policy with the below categories.

        <BEGIN UNSAFE CONTENT CATEGORIES>
        {"".join([f"{category['instruction']}" for category in UNSAFE_CATEGORIES])}
        <END UNSAFE CONTENT CATEGORIES>

        <BEGIN CONVERSATION>

        """
    full_prompt += f"User: {user_prompt}\n\n"
    full_prompt += """<END CONVERSATION>

        Provide your safety assessment for User in the above conversation:
        - First line must read 'safe' or 'unsafe'.
        - If unsafe, a second line must include a comma-separated list of violated categories. [/INST]"""
    return full_prompt


def parse_block_message(moderation_output: str) -> str:
    """Blocked category + reason from the model output (aegis.py:70-84)."""
    block_msg = "Prompt blocked by Aegis."
    try:
        lines = moderation_output.split("\n")
        if len(lines) >= 2:
            # int() of the whole second line: a multi-category line like
            # "O1,O3" raises and yields the generic message — reference
            # behavior (aegis.py:76-81), kept
            blocked_category = int(lines[1].lstrip("O")) - 1
            if 0 <= blocked_category < len(UNSAFE_CATEGORIES):
                cat = UNSAFE_CATEGORIES[blocked_category]
                block_msg = f"{cat['category']}: {cat['blocked_reason']}"
    except Exception:
        pass
    return block_msg


def _load_safetensors_dir(d: Path) -> dict:
    """All non-adapter *.safetensors / pytorch *.bin weights under d."""
    sd: dict = {}
    files = sorted(p for p in d.glob("*.safetensors")
                   if not p.name.startswith("adapter"))
    if files:
        from safetensors import safe_open

        for f in files:
            with safe_open(str(f), framework="np") as h:
                for k in h.keys():
                    sd[k] = h.get_tensor(k)
        return sd
    bins = sorted(d.glob("pytorch_model*.bin"))
    if bins:
        import torch

        for f in bins:
            for k, v in torch.load(f, map_location="cpu",
                                   weights_only=True).items():
                sd[k] = v.float().numpy()
    return sd


def _load_adapter(d: Path):
    """(adapter state dict, lora_alpha, r, use_rslora) or None."""
    cand = list(d.glob("adapter_model.safetensors")) + list(
        d.glob("**/adapter_model.safetensors"))
    if not cand:
        return None
    from safetensors import safe_open

    sd = {}
    with safe_open(str(cand[0]), framework="np") as h:
        for k in h.keys():
            sd[k] = h.get_tensor(k)
    cfg_path = cand[0].parent / "adapter_config.json"
    cfg = json.loads(cfg_path.read_text()) if cfg_path.exists() else {}
    return (sd, float(cfg.get("lora_alpha", 16)), int(cfg.get("r", 16)),
            bool(cfg.get("use_rslora", False)))


class AegisLlamaGuard:
    """Checkpoint-backed Aegis safety model on the repo's AR stack."""

    def __init__(self, ckpt_dir: str | Path, max_new_tokens: int = 100,
                 tokenizer=None):
        from tclight_tpu.models.ar_transformer import (
            ARConfig, ARGenerator, Transformer)
        from tclight_tpu.models.convert_ar import (
            convert_ar_llm, from_hf_llama, merge_lora)

        d = Path(str(ckpt_dir))
        hf_cfg = {}
        cfg_file = d / "config.json"
        if cfg_file.exists():
            hf_cfg = json.loads(cfg_file.read_text())
        cfg = ARConfig(
            vocab_size=hf_cfg.get("vocab_size", 32000),
            dim=hf_cfg.get("hidden_size", 4096),
            n_layers=hf_cfg.get("num_hidden_layers", 32),
            n_heads=hf_cfg.get("num_attention_heads", 32),
            n_kv_heads=hf_cfg.get(
                "num_key_value_heads", hf_cfg.get("num_attention_heads", 32)),
            ffn_hidden=hf_cfg.get("intermediate_size", 11008),
            max_seq_len=4096,
            rope_theta=hf_cfg.get("rope_theta", 10000.0),
            norm_eps=hf_cfg.get("rms_norm_eps", 1e-5),
        )
        sd = _load_safetensors_dir(d)
        if not sd:
            raise FileNotFoundError(f"no model weights under {d}")
        adapter = _load_adapter(d)
        if adapter is not None:
            a_sd, alpha, r, rs = adapter
            sd = merge_lora(sd, a_sd, alpha, r, use_rslora=rs)
        params = {"params": convert_ar_llm(
            from_hf_llama(sd, cfg.n_heads, cfg.n_kv_heads), cfg.n_layers)}
        self.cfg = cfg
        self.model = Transformer(cfg)
        self.generator = ARGenerator(self.model, params, cfg)
        self.max_new_tokens = max_new_tokens

        if tokenizer is None:
            from transformers import AutoTokenizer

            tokenizer = AutoTokenizer.from_pretrained(str(d))
        self.tokenizer = tokenizer
        self.eos_id = int(self.tokenizer.eos_token_id)

    def moderate(self, prompt: str) -> str:
        """Generate the raw moderation output for a user prompt."""
        full = moderation_prompt(prompt)
        # reference: tokenizer([...], add_special_tokens=False)
        ids = self.tokenizer(full, add_special_tokens=False)["input_ids"]
        tokens = np.asarray([ids], dtype=np.int32)
        out = self.generator.generate(
            prompt_tokens=tokens, max_gen_len=self.max_new_tokens,
            temperature=0.0, stop_tokens=(self.eos_id,),
        )
        gen = [int(t) for t in out[0]]
        if self.eos_id in gen:
            gen = gen[: gen.index(self.eos_id)]
        return self.tokenizer.decode(gen, skip_special_tokens=True)

    def is_safe(self, prompt: str) -> tuple[bool, str]:
        """(safe, block message) — reference filter_aegis_output."""
        out = self.moderate(prompt)
        if "unsafe" in out.lower():
            return False, parse_block_message(out)
        return True, ""
