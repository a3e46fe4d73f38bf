"""AR/VLM checkpoint converter parity vs transformers CPU oracles.

Exercises the HF-layout remap (incl. the rotate-half RoPE un-permutation)
and the cosmos-native mapping on tiny random models; the real Pixtral-12B
weights use identical key schemas (SURVEY §2.6, model.py:219-299)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from tclight_tpu.models.ar_transformer import ARConfig, Transformer
from tclight_tpu.models.convert_ar import (
    convert_ar_llm,
    convert_mm_projector,
    convert_pixtral_vit,
    convert_vlm_checkpoint,
    expand_vocab,
    from_hf_pixtral,
)
from tclight_tpu.models.pixtral import MultimodalProjector, PixtralViT, ViTConfig


def _sd_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


@pytest.fixture(scope="module")
def mistral_tiny():
    from transformers import MistralConfig, MistralForCausalLM

    cfg = MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, sliding_window=None, attention_dropout=0.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = MistralForCausalLM(cfg).eval()
    return cfg, model


def test_llm_parity_vs_mistral(mistral_tiny):
    hf_cfg, model = mistral_tiny
    sd = {f"language_model.{k}": v for k, v in _sd_numpy(model).items()}
    native = from_hf_pixtral(sd, llm_heads=4, llm_kv_heads=2, vit_heads=4)
    llm_sd = {k[len("model."):]: v for k, v in native.items()
              if k.startswith("model.")}
    params = convert_ar_llm(llm_sd, n_layers=2)

    cfg = ARConfig(
        vocab_size=128, dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
        head_dim=16, ffn_hidden=128, max_seq_len=256, rope_theta=10000.0,
    )
    ours = Transformer(cfg)

    ids = np.array([[3, 17, 99, 4, 77, 23, 8, 1]], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(ids, dtype=torch.long)).logits.numpy()
    got, _ = ours.apply({"params": params}, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)


@pytest.mark.slow
def test_vit_parity_vs_pixtral(mistral_tiny):
    from transformers import PixtralVisionConfig, PixtralVisionModel

    hf = PixtralVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=64, patch_size=16,
        rope_theta=10000.0, hidden_act="silu",
    )
    torch.manual_seed(1)
    model = PixtralVisionModel(hf).eval()
    sd = {f"vision_tower.{k}": v for k, v in _sd_numpy(model).items()}
    native = from_hf_pixtral(sd, llm_heads=4, llm_kv_heads=2, vit_heads=4)
    vit_sd = {k[len("vision_encoder."):]: v for k, v in native.items()
              if k.startswith("vision_encoder.")}
    params = convert_pixtral_vit(vit_sd, n_layers=2)

    cfg = ViTConfig(image_size=64, patch_size=16, dim=64, n_layers=2,
                    n_heads=4, ffn_hidden=128, rope_theta=10000.0)
    ours = PixtralViT(cfg)

    img = np.random.default_rng(0).standard_normal((1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = model(
            torch.tensor(img.transpose(0, 3, 1, 2)),
            image_sizes=torch.tensor([[64, 64]]),
        ).last_hidden_state.numpy()
    got = ours.apply({"params": params}, jnp.asarray(img))
    # looser than the LLM check: oneDNN vs XLA conv/matmul accumulation
    # order differences amplify through two attention layers
    np.testing.assert_allclose(
        np.asarray(got).reshape(ref.shape), ref, atol=1e-3
    )


def test_projector_and_native_split():
    rng = np.random.default_rng(0)
    proj_sd = {
        "projector.0.weight": rng.standard_normal((32, 16)).astype(np.float32),
        "projector.0.bias": rng.standard_normal(32).astype(np.float32),
        "projector.2.weight": rng.standard_normal((32, 32)).astype(np.float32),
        "projector.2.bias": rng.standard_normal(32).astype(np.float32),
    }
    params = convert_mm_projector(proj_sd)
    proj = MultimodalProjector(out_dim=32)
    x = rng.standard_normal((1, 4, 16)).astype(np.float32)
    got = proj.apply({"params": params}, jnp.asarray(x))

    import torch.nn as tnn

    ref_mod = tnn.Sequential(
        tnn.Linear(16, 32), tnn.GELU(), tnn.Linear(32, 32)
    )
    with torch.no_grad():
        ref_mod[0].weight.copy_(torch.tensor(proj_sd["projector.0.weight"]))
        ref_mod[0].bias.copy_(torch.tensor(proj_sd["projector.0.bias"]))
        ref_mod[2].weight.copy_(torch.tensor(proj_sd["projector.2.weight"]))
        ref_mod[2].bias.copy_(torch.tensor(proj_sd["projector.2.bias"]))
        ref = ref_mod(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_vlm_checkpoint_split_and_vocab_expansion():
    """cosmos-native combined dict (convert_pixtral_ckpt.py:81-113) splits
    into the three param trees; vocab expansion matches model.py:283-291."""
    rng = np.random.default_rng(0)
    d, v, ffn, hd = 16, 32, 24, 8

    def lin(o, i):
        return rng.standard_normal((o, i)).astype(np.float32)

    ckpt = {"model.tok_embeddings.weight": lin(v, d),
            "model.norm.weight": np.ones(d, np.float32),
            "model.output.weight": lin(v, d)}
    for i in range(1):
        r = f"model.layers.{i}."
        ckpt.update({
            f"{r}attention.wq.weight": lin(d, d),
            f"{r}attention.wk.weight": lin(d, d),
            f"{r}attention.wv.weight": lin(d, d),
            f"{r}attention.wo.weight": lin(d, d),
            f"{r}attention_norm.weight": np.ones(d, np.float32),
            f"{r}feed_forward.w1.weight": lin(ffn, d),
            f"{r}feed_forward.w2.weight": lin(d, ffn),
            f"{r}feed_forward.w3.weight": lin(ffn, d),
            f"{r}ffn_norm.weight": np.ones(d, np.float32),
        })
    ckpt.update({
        "vision_encoder.patch_conv.weight":
            rng.standard_normal((d, 3, 4, 4)).astype(np.float32),
        "vision_encoder.ln_pre.weight": np.ones(d, np.float32),
    })
    for i in range(1):
        r = f"vision_encoder.transformer.layers.{i}."
        ckpt.update({
            f"{r}attention.wq.weight": lin(d, d),
            f"{r}attention.wk.weight": lin(d, d),
            f"{r}attention.wv.weight": lin(d, d),
            f"{r}attention.wo.weight": lin(d, d),
            f"{r}attention_norm.weight": np.ones(d, np.float32),
            f"{r}feed_forward.w1.weight": lin(ffn, d),
            f"{r}feed_forward.w2.weight": lin(d, ffn),
            f"{r}feed_forward.w3.weight": lin(ffn, d),
            f"{r}ffn_norm.weight": np.ones(d, np.float32),
        })
    ckpt.update({
        "mm_projector.projector.0.weight": lin(d, d),
        "mm_projector.projector.0.bias": np.zeros(d, np.float32),
        "mm_projector.projector.2.weight": lin(d, d),
        "mm_projector.projector.2.bias": np.zeros(d, np.float32),
    })
    llm, vit, proj = convert_vlm_checkpoint(ckpt, llm_layers=1, vit_layers=1)
    assert llm["tok_embeddings"]["embedding"].shape == (v, d)
    assert vit["patch_conv"]["kernel"].shape == (4, 4, 3, d)
    assert proj["w_in"]["kernel"].shape == (d, d)

    grown = expand_vocab(llm, v + 10)
    assert grown["tok_embeddings"]["embedding"].shape == (v + 10, d)
    assert grown["output"]["kernel"].shape == (d, v + 10)
    # text-to-video mode: embedding grows, unembedding does not
    t2v = expand_vocab(llm, v + 10, expand_output_layer=False)
    assert t2v["output"]["kernel"].shape == (d, v)


def test_load_vlm_native_dir(tmp_path):
    """End-to-end load: cosmos-native model.pt -> assembled PixtralVLM."""
    from tclight_tpu.models.pixtral import load_vlm

    rng = np.random.default_rng(0)
    d, v, ffn = 32, 64, 48

    def lin(o, i):
        return torch.tensor(rng.standard_normal((o, i)).astype(np.float32))

    ckpt = {"model.tok_embeddings.weight": lin(v, d),
            "model.norm.weight": torch.ones(d),
            "model.output.weight": lin(v, d)}
    for i in range(2):
        r = f"model.layers.{i}."
        ckpt.update({
            f"{r}attention.wq.weight": lin(d, d),
            f"{r}attention.wk.weight": lin(d // 2, d),
            f"{r}attention.wv.weight": lin(d // 2, d),
            f"{r}attention.wo.weight": lin(d, d),
            f"{r}attention_norm.weight": torch.ones(d),
            f"{r}feed_forward.w1.weight": lin(ffn, d),
            f"{r}feed_forward.w2.weight": lin(d, ffn),
            f"{r}feed_forward.w3.weight": lin(ffn, d),
            f"{r}ffn_norm.weight": torch.ones(d),
        })
    ckpt["vision_encoder.patch_conv.weight"] = lin(d, 3).reshape(d, 3, 1, 1).repeat(1, 1, 16, 16) * 0.01
    ckpt["vision_encoder.ln_pre.weight"] = torch.ones(d)
    for i in range(1):
        r = f"vision_encoder.transformer.layers.{i}."
        ckpt.update({
            f"{r}attention.wq.weight": lin(d, d),
            f"{r}attention.wk.weight": lin(d, d),
            f"{r}attention.wv.weight": lin(d, d),
            f"{r}attention.wo.weight": lin(d, d),
            f"{r}attention_norm.weight": torch.ones(d),
            f"{r}feed_forward.w1.weight": lin(ffn, d),
            f"{r}feed_forward.w2.weight": lin(d, ffn),
            f"{r}feed_forward.w3.weight": lin(ffn, d),
            f"{r}ffn_norm.weight": torch.ones(d),
        })
    ckpt.update({
        "mm_projector.projector.0.weight": lin(d, d),
        "mm_projector.projector.0.bias": torch.zeros(d),
        "mm_projector.projector.2.weight": lin(d, d),
        "mm_projector.projector.2.bias": torch.zeros(d),
    })
    torch.save(ckpt, tmp_path / "model.pt")

    from tclight_tpu.models.ar_transformer import ARConfig
    from tclight_tpu.models.pixtral import ViTConfig

    acfg = ARConfig(vocab_size=v, dim=d, n_layers=2, n_heads=4,
                    n_kv_heads=2, ffn_hidden=ffn, max_seq_len=128)
    vcfg = ViTConfig(image_size=32, patch_size=16, dim=d, n_layers=1,
                     n_heads=4, ffn_hidden=ffn)
    vlm = load_vlm(tmp_path, cfg=acfg, vit_cfg=vcfg)
    ids = np.full((1, 8), 3, np.int32)
    ids[0, 1:5] = 10  # 4 [IMG] tokens = 2x2 patches of a 32x32 image
    emb = vlm.embed_vision_language(ids, jnp.zeros((1, 32, 32, 3)))
    assert emb.shape == (1, 8, d)
