"""Aegis guardrail parity: taxonomy data, moderation template, block-message
parse (all byte-compared against the reference modules), LoRA merge math
(torch oracle), and the end-to-end LlamaGuard decision path (tiny random
transformers LlamaForCausalLM oracle with a LoRA adapter on disk)."""

from __future__ import annotations

import importlib.machinery
import json
import sys
import types

import numpy as np
import pytest

from _ref_oracle import ref_import

from tclight_tpu.cosmos.aegis import (
    UNSAFE_CATEGORIES, moderation_prompt, parse_block_message)


def _ref_aegis_module():
    """Import reference aegis.py with its heavy deps stubbed (peft, loguru
    via cosmos1.utils.log/misc) — we only exercise its pure-string
    methods, unbound."""
    class AnyObj:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return self

        def __getattr__(self, k):
            return self

    for name, attrs in [
        ("peft", {"PeftModel": AnyObj}),
        ("cosmos1.utils.log", {"warning": lambda *a, **k: None,
                               "error": lambda *a, **k: None,
                               "info": lambda *a, **k: None,
                               "debug": lambda *a, **k: None,
                               "critical": lambda *a, **k: None}),
        ("cosmos1.utils.misc", {"Color": AnyObj(), "timer": AnyObj()}),
    ]:
        if name in sys.modules:
            continue
        m = types.ModuleType(name)
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
    return ref_import("cosmos1.models.guardrail.aegis.aegis")


def test_categories_match_reference_bytes():
    ref = ref_import("cosmos1.models.guardrail.aegis.categories")
    assert len(UNSAFE_CATEGORIES) == len(ref.UNSAFE_CATEGORIES)
    for ours, theirs in zip(UNSAFE_CATEGORIES, ref.UNSAFE_CATEGORIES):
        for k in ("category", "blocked_reason", "instruction"):
            assert ours[k] == theirs[k], f"{ours['category']}.{k} diverges"


def test_moderation_prompt_matches_reference_bytes():
    ref = _ref_aegis_module()
    for prompt in ("a cat on a sofa", "", "multi\nline\nprompt",
                   'quotes "and" {braces}'):
        assert moderation_prompt(prompt) == ref.Aegis.get_moderation_prompt(
            None, prompt)


def test_parse_block_message_matches_reference():
    ref = _ref_aegis_module()
    cases = [
        "unsafe\nO1", "unsafe\nO2", "unsafe\nO11", "unsafe\nO12",
        "unsafe\nO13",            # out of range -> generic message
        "unsafe\nO1,O3",          # int() raises -> generic message
        "unsafe",                 # single line -> generic message
        "unsafe\n3", "unsafe\ngarbage", "unsafe\nO0",
    ]
    for out in cases:
        assert parse_block_message(out) == ref.Aegis.get_aegis_block_message(
            None, out), out


def test_merge_lora_matches_torch_math(rng):
    torch = pytest.importorskip("torch")
    from tclight_tpu.models.convert_ar import merge_lora

    w = rng.normal(size=(12, 8)).astype(np.float32)
    a = rng.normal(size=(4, 8)).astype(np.float32)   # lora_A: (r, in)
    b = rng.normal(size=(12, 4)).astype(np.float32)  # lora_B: (out, r)
    base = {"model.layers.0.self_attn.q_proj.weight": w,
            "model.layers.0.self_attn.o_proj.weight": w.copy()}
    adapter = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
    }
    alpha, r = 16.0, 4
    merged = merge_lora(base, adapter, alpha, r)
    expected = (torch.from_numpy(w)
                + (alpha / r) * torch.from_numpy(b) @ torch.from_numpy(a))
    np.testing.assert_allclose(
        merged["model.layers.0.self_attn.q_proj.weight"],
        expected.numpy(), rtol=1e-6)
    # untouched keys pass through
    np.testing.assert_array_equal(
        merged["model.layers.0.self_attn.o_proj.weight"], w)
    # rsLoRA scaling
    merged_rs = merge_lora(base, adapter, alpha, r, use_rslora=True)
    expected_rs = w + (alpha / np.sqrt(r)) * (b @ a)
    np.testing.assert_allclose(
        merged_rs["model.layers.0.self_attn.q_proj.weight"],
        expected_rs, rtol=1e-5)


class _WordTokenizer:
    """Deterministic word-level tokenizer for the tiny e2e test (the
    reference's SentencePiece tokenizer is checkpoint data, not logic
    under test — both sides of the parity check share this one)."""

    eos_token_id = 2

    def __init__(self, vocab: int):
        self.vocab = vocab

    def __call__(self, text, add_special_tokens=False):
        ids = [3 + (hash(wd) % (self.vocab - 3)) for wd in text.split()]
        return {"input_ids": ids}

    def decode(self, ids, skip_special_tokens=True):
        # invertibility doesn't matter for the decision test; include the
        # trigger word when the "unsafe token" id appears
        return " ".join("unsafe" if i % 2 == 1 else "tok" for i in ids)


@pytest.mark.slow
def test_aegis_llamaguard_end_to_end_matches_torch_oracle(tmp_path, rng):
    """Tiny random HF Llama + LoRA adapter on disk: our checkpoint-loading
    + LoRA merge + greedy decode must produce the same token sequence and
    the same safe/unsafe decision as transformers' LlamaForCausalLM with
    the adapter merged manually."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from safetensors.numpy import save_file

    vocab, dim, layers, heads, kv_heads, ffn = 128, 64, 2, 4, 2, 96
    cfg_hf = transformers.LlamaConfig(
        vocab_size=vocab, hidden_size=dim, num_hidden_layers=layers,
        num_attention_heads=heads, num_key_value_heads=kv_heads,
        intermediate_size=ffn, rms_norm_eps=1e-5, rope_theta=10000.0,
        max_position_embeddings=4096, attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(cfg_hf).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0.0, 0.05)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    # random LoRA adapter on q/v projections, PEFT key layout
    alpha, r = 8.0, 2
    adapter = {}
    for i in range(layers):
        for proj, out_dim in (("q_proj", dim), ("v_proj", kv_heads * (dim // heads))):
            a = rng.normal(size=(r, dim)).astype(np.float32) * 0.05
            b = rng.normal(size=(out_dim, r)).astype(np.float32) * 0.05
            pre = f"base_model.model.model.layers.{i}.self_attn.{proj}"
            adapter[f"{pre}.lora_A.weight"] = a
            adapter[f"{pre}.lora_B.weight"] = b

    d = tmp_path / "aegis_ckpt"
    d.mkdir()
    save_file(sd, str(d / "model.safetensors"))
    save_file(adapter, str(d / "adapter_model.safetensors"))
    (d / "adapter_config.json").write_text(
        json.dumps({"lora_alpha": alpha, "r": r}))
    (d / "config.json").write_text(json.dumps({
        "vocab_size": vocab, "hidden_size": dim, "num_hidden_layers": layers,
        "num_attention_heads": heads, "num_key_value_heads": kv_heads,
        "intermediate_size": ffn, "rms_norm_eps": 1e-5,
        "rope_theta": 10000.0,
    }))

    # torch oracle: merge adapter manually, greedy decode
    with torch.no_grad():
        msd = model.state_dict()
        for i in range(layers):
            for proj in ("q_proj", "v_proj"):
                pre = f"base_model.model.model.layers.{i}.self_attn.{proj}"
                key = f"model.layers.{i}.self_attn.{proj}.weight"
                delta = (alpha / r) * (
                    torch.from_numpy(adapter[f"{pre}.lora_B.weight"])
                    @ torch.from_numpy(adapter[f"{pre}.lora_A.weight"]))
                msd[key] += delta
        model.load_state_dict(msd)

    tok = _WordTokenizer(vocab)
    prompt_ids = tok(moderation_prompt("a cat in the sun"))["input_ids"]
    max_new = 12
    with torch.no_grad():
        ids = torch.tensor([prompt_ids])
        generated = []
        for _ in range(max_new):
            logits = model(ids).logits[:, -1]
            nxt = int(logits.argmax(-1))
            generated.append(nxt)
            if nxt == tok.eos_token_id:
                break
            ids = torch.cat([ids, torch.tensor([[nxt]])], 1)

    from tclight_tpu.cosmos.aegis import AegisLlamaGuard

    guard = AegisLlamaGuard(d, max_new_tokens=max_new, tokenizer=tok)
    out = guard.generator.generate(
        prompt_tokens=np.asarray([prompt_ids], np.int32),
        max_gen_len=max_new, temperature=0.0,
        stop_tokens=(tok.eos_token_id,))
    ours = [int(t) for t in out[0]]
    if tok.eos_token_id in ours:
        ours = ours[: ours.index(tok.eos_token_id) + 1]

    assert ours == generated, (ours, generated)

    # decision consistency through the full is_safe path
    safe, msg = guard.is_safe("a cat in the sun")
    oracle_text = tok.decode(
        generated[:-1] if generated[-1] == tok.eos_token_id else generated)
    assert safe == ("unsafe" not in oracle_text.lower())
