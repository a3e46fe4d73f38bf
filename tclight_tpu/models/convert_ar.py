"""Checkpoint converters for the AR/VLM stack (Pixtral-12B prompt
upsampler and the Cosmos AR family).

On-disk contracts supported (zero-egress build: converters are exercised
against synthetic key-compatible state dicts + a transformers CPU oracle;
real 12B weights drop in unchanged):

1. **Cosmos-native** — the artifact produced by the reference's
   `cosmos1/scripts/convert_pixtral_ckpt.py:81-113` and consumed by
   `AutoRegressiveModel.build` (cosmos1/models/autoregressive/model.py:
   219-299): one dict with ``model.*`` (Mistral-style LLM:
   ``layers.{i}.attention.wq.weight`` ...), ``vision_encoder.*`` (Pixtral
   ViT native keys: ``transformer.layers.{i}...``, ``patch_conv.weight``,
   ``ln_pre.weight``), and ``mm_projector.*`` (``projector.0/2`` Sequential
   indices).
2. **HF hub layout** (mistral-community/pixtral-12b) — LlavaForConditional
   Generation naming (``language_model.model.layers.{i}.self_attn.q_proj``,
   ``vision_tower...attention.q_proj``, ``multi_modal_projector.linear_1/2``)
   with the rotate-half RoPE permutation HF applies to q/k projections;
   `from_hf_pixtral` un-permutes back to the interleaved (llama-native)
   convention our `apply_rope` uses.

All outputs are flax param pytrees for `models/ar_transformer.Transformer`,
`models/pixtral.PixtralViT` and `models/pixtral.MultimodalProjector`.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

__all__ = [
    "convert_ar_llm",
    "convert_pixtral_vit",
    "convert_mm_projector",
    "convert_vlm_checkpoint",
    "from_hf_pixtral",
    "from_hf_llama",
    "merge_lora",
    "expand_vocab",
]


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) -> flax kernel (in, out)."""
    return np.ascontiguousarray(np.transpose(np.asarray(w)))


def _np(w) -> np.ndarray:
    return np.asarray(w)


def convert_ar_llm(sd: Mapping[str, np.ndarray], n_layers: int) -> dict:
    """Mistral/Cosmos-native LLM keys -> Transformer params
    (keys per cosmos1 modules/attention.py:90-93, mlp.py:35-37,
    networks/transformer.py:81-82)."""
    p: dict = {
        "tok_embeddings": {"embedding": _np(sd["tok_embeddings.weight"])},
        "norm": {"weight": _np(sd["norm.weight"])},
        "output": {"kernel": _t(sd["output.weight"])},
    }
    for i in range(n_layers):
        r = f"layers.{i}."
        blk = {
            "attention": {
                w: {"kernel": _t(sd[f"{r}attention.{w}.weight"])}
                for w in ("wq", "wk", "wv", "wo")
            },
            "attention_norm": {"weight": _np(sd[f"{r}attention_norm.weight"])},
            "feed_forward": {
                w: {"kernel": _t(sd[f"{r}feed_forward.{w}.weight"])}
                for w in ("w1", "w2", "w3")
            },
            "ffn_norm": {"weight": _np(sd[f"{r}ffn_norm.weight"])},
        }
        # optional QK-normalization (cosmos attention.py:104-105)
        if f"{r}attention.q_norm.weight" in sd:
            blk["attention"]["q_norm"] = {
                "weight": _np(sd[f"{r}attention.q_norm.weight"])
            }
            blk["attention"]["k_norm"] = {
                "weight": _np(sd[f"{r}attention.k_norm.weight"])
            }
        p[f"layers_{i}"] = blk
    return p


def convert_pixtral_vit(sd: Mapping[str, np.ndarray], n_layers: int) -> dict:
    """Pixtral ViT native keys -> PixtralViT params (vit.py:96-410)."""
    p: dict = {
        "patch_conv": {
            # OIHW -> HWIO
            "kernel": np.transpose(_np(sd["patch_conv.weight"]), (2, 3, 1, 0))
        },
        "ln_pre": {"weight": _np(sd["ln_pre.weight"])},
    }
    for i in range(n_layers):
        r = f"transformer.layers.{i}."
        p[f"layers_{i}_attention"] = {
            w: {"kernel": _t(sd[f"{r}attention.{w}.weight"])}
            for w in ("wq", "wk", "wv", "wo")
        }
        p[f"layers_{i}_attention_norm"] = {
            "weight": _np(sd[f"{r}attention_norm.weight"])
        }
        p[f"layers_{i}_feed_forward"] = {
            w: {"kernel": _t(sd[f"{r}feed_forward.{w}.weight"])}
            for w in ("w1", "w2", "w3")
        }
        p[f"layers_{i}_ffn_norm"] = {"weight": _np(sd[f"{r}ffn_norm.weight"])}
    return p


def convert_mm_projector(sd: Mapping[str, np.ndarray]) -> dict:
    """``projector.0/2`` Sequential keys (convert_pixtral_ckpt.py:90-93)
    -> MultimodalProjector params (w_in/GELU/w_out)."""
    return {
        "w_in": {"kernel": _t(sd["projector.0.weight"]),
                 "bias": _np(sd["projector.0.bias"])},
        "w_out": {"kernel": _t(sd["projector.2.weight"]),
                  "bias": _np(sd["projector.2.bias"])},
    }


def _split_prefix(ckpt: Mapping[str, np.ndarray], prefix: str) -> dict:
    return {k[len(prefix):]: v for k, v in ckpt.items() if k.startswith(prefix)}


def convert_vlm_checkpoint(
    ckpt: Mapping[str, np.ndarray], llm_layers: int, vit_layers: int
) -> tuple[dict, dict, dict]:
    """Split + convert a combined cosmos-native VLM checkpoint
    (model.py:233-256 contract). Returns (llm, vit, projector) params."""
    if "model" in ckpt and isinstance(ckpt["model"], Mapping):
        flat = dict(ckpt["model"])
        vit_sd = dict(ckpt.get("vision_encoder", {}))
        proj_sd = dict(ckpt.get("mm_projector", {}))
    else:
        flat = _split_prefix(ckpt, "model.")
        vit_sd = _split_prefix(ckpt, "vision_encoder.")
        proj_sd = _split_prefix(ckpt, "mm_projector.")
    if not vit_sd:  # fine-tuned layout: everything under model.*
        vit_sd = _split_prefix(flat, "vision_encoder.")
        proj_sd = _split_prefix(flat, "mm_projector.")
        flat = {
            k: v for k, v in flat.items()
            if not k.startswith(("vision_encoder.", "mm_projector."))
        }
    llm = convert_ar_llm(flat, llm_layers)
    vit = convert_pixtral_vit(vit_sd, vit_layers)
    proj = convert_mm_projector(proj_sd)
    return llm, vit, proj


def _unpermute_rotary(w: np.ndarray, n_heads: int) -> np.ndarray:
    """HF stores q/k weights permuted for rotate_half RoPE; restore the
    interleaved (native) row order: native[2i] = hf[i],
    native[2i+1] = hf[i + hd/2] within each head's row block."""
    out_dim, in_dim = w.shape
    hd = out_dim // n_heads
    w = w.reshape(n_heads, 2, hd // 2, in_dim)
    w = np.transpose(w, (0, 2, 1, 3))  # (heads, hd/2, 2, in)
    return w.reshape(out_dim, in_dim)


def from_hf_pixtral(
    sd: Mapping[str, np.ndarray],
    llm_heads: int,
    llm_kv_heads: int,
    vit_heads: int,
) -> dict:
    """Remap the HF pixtral-12b layout to the cosmos-native flat layout
    (then feed `convert_vlm_checkpoint`)."""
    out: dict = {}
    for k, v in sd.items():
        v = _np(v)
        if k.startswith("language_model.model.") or k.startswith("language_model."):
            k2 = k.split("language_model.", 1)[1]
            k2 = k2.removeprefix("model.")
            k2 = (
                k2.replace("embed_tokens", "tok_embeddings")
                .replace("self_attn.q_proj", "attention.wq")
                .replace("self_attn.k_proj", "attention.wk")
                .replace("self_attn.v_proj", "attention.wv")
                .replace("self_attn.o_proj", "attention.wo")
                .replace("mlp.gate_proj", "feed_forward.w1")
                .replace("mlp.down_proj", "feed_forward.w2")
                .replace("mlp.up_proj", "feed_forward.w3")
                .replace("input_layernorm", "attention_norm")
                .replace("post_attention_layernorm", "ffn_norm")
                .replace("lm_head", "output")
            )
            if k2 == "lm_head.weight":
                k2 = "output.weight"
            if ".wq." in k2:
                v = _unpermute_rotary(v, llm_heads)
            elif ".wk." in k2:
                v = _unpermute_rotary(v, llm_kv_heads)
            out["model." + k2] = v
        elif k == "lm_head.weight":
            out["model.output.weight"] = v
        elif k.startswith("vision_tower."):
            k2 = k.split("vision_tower.", 1)[1]
            k2 = (
                k2.replace("attention.q_proj", "attention.wq")
                .replace("attention.k_proj", "attention.wk")
                .replace("attention.v_proj", "attention.wv")
                .replace("attention.o_proj", "attention.wo")
                .replace("feed_forward.gate_proj", "feed_forward.w1")
                .replace("feed_forward.down_proj", "feed_forward.w2")
                .replace("feed_forward.up_proj", "feed_forward.w3")
            )
            if ".wq." in k2:
                v = _unpermute_rotary(v, vit_heads)
            elif ".wk." in k2:
                v = _unpermute_rotary(v, vit_heads)
            out["vision_encoder." + k2] = v
        elif k.startswith("multi_modal_projector."):
            k2 = k.split("multi_modal_projector.", 1)[1]
            k2 = k2.replace("linear_1", "projector.0").replace(
                "linear_2", "projector.2"
            )
            out["mm_projector." + k2] = v
    return out


def from_hf_llama(
    sd: Mapping[str, np.ndarray], n_heads: int, n_kv_heads: int
) -> dict:
    """Remap an HF LlamaForCausalLM state dict (LlamaGuard-7b layout:
    ``model.layers.{i}.self_attn.q_proj.weight`` ...) to the cosmos-native
    flat layout consumed by `convert_ar_llm`, un-permuting the rotate-half
    RoPE row order HF applies to q/k."""
    out: dict = {}
    for k, v in sd.items():
        v = _np(v)
        if k == "lm_head.weight":
            out["output.weight"] = v
            continue
        k2 = k.removeprefix("model.")
        k2 = (
            k2.replace("embed_tokens", "tok_embeddings")
            .replace("self_attn.q_proj", "attention.wq")
            .replace("self_attn.k_proj", "attention.wk")
            .replace("self_attn.v_proj", "attention.wv")
            .replace("self_attn.o_proj", "attention.wo")
            .replace("mlp.gate_proj", "feed_forward.w1")
            .replace("mlp.down_proj", "feed_forward.w2")
            .replace("mlp.up_proj", "feed_forward.w3")
            .replace("input_layernorm", "attention_norm")
            .replace("post_attention_layernorm", "ffn_norm")
        )
        if ".wq." in k2:
            v = _unpermute_rotary(v, n_heads)
        elif ".wk." in k2:
            v = _unpermute_rotary(v, n_kv_heads)
        out[k2] = v
    return out


def merge_lora(
    base_sd: Mapping[str, np.ndarray],
    adapter_sd: Mapping[str, np.ndarray],
    lora_alpha: float,
    r: int,
    use_rslora: bool = False,
) -> dict:
    """Merge a PEFT LoRA adapter into a base HF state dict:
    ``W' = W + scale * B @ A`` with ``scale = lora_alpha / r``
    (rsLoRA: ``lora_alpha / sqrt(r)``) — what `PeftModel.from_pretrained`
    + `merge_and_unload` does for the Aegis LlamaGuard adapter
    (reference cosmos1/models/guardrail/aegis/aegis.py:40-48).

    Adapter keys use the PEFT wrapping prefix
    ``base_model.model.<module>.lora_A.weight`` /  ``...lora_B.weight``;
    the target base key is ``<module>.weight``. Done in float32 numpy;
    keys absent from the adapter pass through unchanged."""
    scale = lora_alpha / (np.sqrt(r) if use_rslora else r)
    merged = {k: _np(v) for k, v in base_sd.items()}
    for k, a in adapter_sd.items():
        if ".lora_A." not in k:
            continue
        b_key = k.replace(".lora_A.", ".lora_B.")
        module = k.split(".lora_A.")[0].removeprefix("base_model.model.")
        target = module + ".weight"
        if target not in merged:
            raise KeyError(f"LoRA adapter targets missing base key {target}")
        a_w = _np(a).astype(np.float32)            # (r, in)
        b_w = _np(adapter_sd[b_key]).astype(np.float32)   # (out, r)
        merged[target] = (
            merged[target].astype(np.float32) + scale * (b_w @ a_w)
        )
    return merged


def expand_vocab(
    llm_params: dict,
    new_vocab: int,
    expand_output_layer: bool = True,
    seed: int = 0,
    std: float = 0.02,
) -> dict:
    """Vocab expansion with gaussian init (model.py:283-291 semantics:
    text-to-video expands only the embedding, not the unembedding)."""
    rng = np.random.default_rng(seed)
    emb = np.asarray(llm_params["tok_embeddings"]["embedding"])
    v0, d = emb.shape
    if new_vocab > v0:
        extra = rng.normal(0.0, std, (new_vocab - v0, d)).astype(emb.dtype)
        llm_params = dict(llm_params)
        llm_params["tok_embeddings"] = {
            "embedding": np.concatenate([emb, extra], axis=0)
        }
        if expand_output_layer:
            kern = np.asarray(llm_params["output"]["kernel"])  # (d, v)
            extra_o = rng.normal(0.0, std, (d, new_vocab - v0)).astype(kern.dtype)
            llm_params["output"] = {
                "kernel": np.concatenate([kern, extra_o], axis=1)
            }
    return llm_params
