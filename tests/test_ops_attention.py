import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.ops.attention import (
    dot_product_attention,
    flash_attention,
)


def _make_qkv(rng, b=2, sq=100, skv=77, h=4, d=40):
    q = rng.standard_normal((b, sq, h, d)).astype(np.float32)
    k = rng.standard_normal((b, skv, h, d)).astype(np.float32)
    v = rng.standard_normal((b, skv, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_xla_flash_matches_naive(rng):
    q, k, v = _make_qkv(rng)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_xla_flash_chunking_edges(rng):
    # kv length not a multiple of the chunk: padding must not leak
    q, k, v = _make_qkv(rng, sq=33, skv=1500, h=2, d=16)
    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_pallas_interpret_matches_naive(rng):
    # Pallas kernel in interpreter mode (CPU) vs naive attention
    from jax.experimental import pallas as pl
    from tclight_tpu.ops import attention as A
    import functools

    q, k, v = _make_qkv(rng, b=1, sq=300, skv=300, h=2, d=40)
    ref = dot_product_attention(q, k, v)

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = A._flash_attention_pallas(q, k, v, scale=1.0 / np.sqrt(40))
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_softmax_scale_override(rng):
    q, k, v = _make_qkv(rng, sq=16, skv=16, h=1, d=8)
    out1 = flash_attention(q, k, v, scale=0.5, backend="xla")
    ref1 = dot_product_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-5)
