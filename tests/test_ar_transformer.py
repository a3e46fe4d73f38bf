"""AR transformer: causal/cache invariants + sampling behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.ar_transformer import (
    ARConfig,
    ARGenerator,
    Transformer,
    apply_rope,
    init_cache,
    rope_frequencies,
    sample_top_k,
    sample_top_p,
)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = ARConfig.tiny()
    model = Transformer(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens=tokens)
    return model, params, cfg


def test_rope_rotation_preserves_norm(rng):
    rope = rope_frequencies(16, 32, 10000.0)
    x = jnp.asarray(rng.standard_normal((1, 5, 2, 16)).astype(np.float32))
    out = apply_rope(x, rope, jnp.arange(5))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        atol=1e-5,
    )
    # position 0 is identity
    out0 = apply_rope(x[:, :1], rope, jnp.asarray([0]))
    np.testing.assert_allclose(np.asarray(out0), np.asarray(x[:, :1]), atol=1e-6)


def test_causality(tiny_model, rng):
    model, params, cfg = tiny_model
    t1 = jnp.asarray(rng.integers(0, 256, (1, 8)))
    t2 = t1.at[0, -1].set((t1[0, -1] + 1) % 256)
    l1, _ = model.apply(params, tokens=t1)
    l2, _ = model.apply(params, tokens=t2)
    np.testing.assert_allclose(np.asarray(l1)[0, :-1], np.asarray(l2)[0, :-1],
                               atol=1e-4)
    assert np.abs(np.asarray(l1)[0, -1] - np.asarray(l2)[0, -1]).max() > 1e-3


def test_kv_cache_decode_matches_full_forward(tiny_model, rng):
    """Prefill + cached single-token decode == full forward on the whole
    sequence."""
    model, params, cfg = tiny_model
    toks = jnp.asarray(rng.integers(0, 256, (1, 10)))
    full_logits, _ = model.apply(params, tokens=toks)

    caches = init_cache(cfg, 1)
    # prefill first 6
    l_pre, caches = model.apply(params, tokens=toks[:, :6], caches=caches,
                                cur_len=0)
    np.testing.assert_allclose(np.asarray(l_pre), np.asarray(full_logits[:, :6]),
                               atol=2e-4)
    # decode 4 tokens one at a time
    for i in range(6, 10):
        l_i, caches = model.apply(
            params, tokens=toks[:, i : i + 1], caches=caches, cur_len=i,
            positions=jnp.asarray([i]),
        )
        np.testing.assert_allclose(
            np.asarray(l_i)[:, 0], np.asarray(full_logits)[:, i], atol=2e-4
        )


def test_sample_top_p_greedy_and_filtering(rng):
    logits = jnp.asarray([[1.0, 2.0, 10.0, 0.0]])
    # temperature ~0 -> argmax
    assert int(sample_top_p(logits, jax.random.PRNGKey(0), 1e-9, 0.9)[0]) == 2
    # top_p tiny -> only the max token survives
    for seed in range(5):
        tok = int(sample_top_p(logits, jax.random.PRNGKey(seed), 1.0, 0.01)[0])
        assert tok == 2
    # top_k=1 -> argmax
    assert int(sample_top_k(logits, jax.random.PRNGKey(0), 1.0, 1)[0]) == 2


@pytest.mark.slow
def test_generator_runs(tiny_model):
    model, params, cfg = tiny_model
    gen = ARGenerator(model, params, cfg)
    prompt = np.array([[1, 2, 3, 4]], np.int32)
    out = gen.generate(prompt_tokens=prompt, max_gen_len=6, temperature=0.8)
    assert out.shape == (1, 6)
    assert ((out >= 0) & (out < cfg.vocab_size)).all()
