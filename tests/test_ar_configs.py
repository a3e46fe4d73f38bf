import numpy as np
import pytest
import jax

from tclight_tpu.models.ar_configs import (
    DiscreteMultimodalTokenizer,
    create_text_model_config,
    create_video2world_model_config,
    create_vision_language_model_config,
)


def test_arch_table():
    cfg = create_text_model_config("mistral", "12b")
    assert cfg.dim == 5120 and cfg.n_layers == 40 and cfg.hd == 128
    vlm = create_vision_language_model_config("pixtral", "12b", max_seq_len=4300)
    assert vlm.max_seq_len == 4300 and vlm.rope_theta == 1e9
    v2w = create_video2world_model_config("5b")
    assert v2w.cross_dim == 1024
    assert 0 in v2w.cross_attn_layers and 4 in v2w.cross_attn_layers
    with pytest.raises(KeyError):
        create_text_model_config("nope", "1b")


@pytest.mark.slow
def test_discrete_multimodal_tokenizer():
    import jax.numpy as jnp

    from tclight_tpu.cosmos.fsq import CausalDiscreteVideoTokenizer, TokenizerConfig

    cfg = TokenizerConfig.tiny()
    tok = CausalDiscreteVideoTokenizer(cfg)
    video = np.random.default_rng(0).uniform(size=(1, 4, 8, 8, 3)).astype(np.float32)
    params = tok.init(jax.random.PRNGKey(0), jnp.asarray(video))
    mm = DiscreteMultimodalTokenizer(tok, params, text_vocab_size=32000)
    tokens = mm.tokenize_video(video)
    assert tokens[0, 0] == 32000 + 64000   # BOV
    assert tokens[0, -1] == 32000 + 64001  # EOV
    assert (tokens[0, 1:-1] >= 32000).all()
    out = mm.detokenize_video(tokens, grid=(2, 4, 4))
    assert out.shape == video.shape
