"""World-generation pipelines + lazy config."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.config import ConfigDict
from tclight_tpu.config_lazy import L, freeze, instantiate, locate, override, unfreeze
from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT
from tclight_tpu.cosmos.fsq import CausalDiscreteVideoTokenizer, TokenizerConfig
from tclight_tpu.cosmos.guardrails import presets_text
from tclight_tpu.cosmos.pipelines import (
    ARVideo2WorldPipeline,
    DiffusionText2WorldPipeline,
)
from tclight_tpu.models.ar_transformer import ARConfig, ARGenerator, Transformer


def test_lazy_config_roundtrip():
    spec = L(dict)(a=1, b=L(list)())
    assert spec["_target_"] == "builtins.dict"
    obj = instantiate(spec)
    assert obj == {"a": 1, "b": []}
    assert locate("tclight_tpu.cosmos.dit.DiTConfig") is DiTConfig


def test_lazy_override_and_freeze():
    cfg = ConfigDict({"model": {"dim": 64}, "lr": 0.1})
    override(cfg, "model.dim=128", "lr=0.2")
    assert cfg.model.dim == 128 and cfg.lr == 0.2
    with pytest.raises(KeyError):
        override(cfg, "nope.deep.path=1")
    freeze(cfg)
    with pytest.raises(TypeError):
        cfg["lr"] = 0.5
    unfreeze(cfg)
    cfg["lr"] = 0.5
    assert cfg.lr == 0.5


@pytest.mark.slow
def test_text2world_pipeline():
    cfg = DiTConfig.tiny()
    dit = GeneralDIT(cfg)
    shape = (1, 4, 8, 8, 4)
    ctx = np.random.default_rng(0).standard_normal((1, 6, cfg.context_dim)).astype(np.float32)
    params = dit.init(jax.random.PRNGKey(0), jnp.zeros(shape),
                      jnp.asarray([0.1]), jnp.asarray(ctx))

    pipe = DiffusionText2WorldPipeline(
        dit=dit, dit_params=params,
        encode_text=lambda prompt: ctx,
        decode_fn=lambda z: np.asarray(jnp.clip(z[..., :3] * 0.5 + 0.5, 0, 1)),
        text_guardrail=presets_text(),
        n_steps=4, latent_shape=shape,
    )
    out = pipe("a calm lake at sunrise")
    assert out is not None and out.shape == (1, 4, 8, 8, 3)
    # guardrail rejection path
    assert pipe("graphic gore footage") is None


@pytest.mark.slow
def test_ar_video2world_pipeline():
    tok_cfg = TokenizerConfig.tiny()
    tokenizer = CausalDiscreteVideoTokenizer(tok_cfg)
    video = np.random.default_rng(0).uniform(size=(1, 4, 8, 8, 3)).astype(np.float32)
    tok_params = tokenizer.init(jax.random.PRNGKey(0), jnp.asarray(video))

    acfg = ARConfig.tiny(vocab_size=tok_cfg.fsq_levels[0] ** 0 * 125 + 75)  # >=125
    model = Transformer(acfg)
    tparams = model.init(jax.random.PRNGKey(1), tokens=jnp.zeros((1, 8), jnp.int32))
    gen = ARGenerator(model, tparams, acfg)

    pipe = ARVideo2WorldPipeline(
        generator=gen, video_tokenizer=tokenizer, tokenizer_params=tok_params,
        max_gen_tokens=16,
    )
    out = pipe(video)
    assert out is not None
    assert out.shape[0] == 1 and out.shape[-1] == 3
    assert out.shape[1] > video.shape[1]  # extended in time
