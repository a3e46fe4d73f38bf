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


def test_pallas_interpret_multiblock_ragged_kv(rng):
    # >1 KV block with a padded final block: the post-exp row mask must
    # zero only the padded columns while earlier blocks skip nothing
    from jax.experimental import pallas as pl
    from tclight_tpu.ops import attention as A
    import functools

    q, k, v = _make_qkv(rng, b=1, sq=130, skv=1500, h=1, d=24)
    ref = dot_product_attention(q, k, v)

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = A._flash_attention_pallas(q, k, v, scale=1.0 / np.sqrt(24))
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4, rtol=1e-3)


def test_softmax_scale_override(rng):
    q, k, v = _make_qkv(rng, sq=16, skv=16, h=1, d=8)
    out1 = flash_attention(q, k, v, scale=0.5, backend="xla")
    ref1 = dot_product_attention(q, k, v, scale=0.5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=2e-5)


def test_pallas_int8_qk_interpret_close_to_naive(rng):
    """int8-QK kernel (interpret mode): K smoothing keeps the softmax
    exact under the shift; the remaining error is 8-bit quantization of
    Q/K rows — bounded ~1e-2 relative on the output."""
    from jax.experimental import pallas as pl
    from tclight_tpu.ops import attention as A
    import functools

    q, k, v = _make_qkv(rng, b=1, sq=300, skv=300, h=2, d=40)
    # a strong common-mode in K exercises the exactness of the smoothing
    k = k + 3.0
    ref = dot_product_attention(q, k, v)

    orig = pl.pallas_call
    try:
        pl.pallas_call = functools.partial(orig, interpret=True)
        out = A._flash_attention_pallas(
            q, k, v, scale=1.0 / np.sqrt(40), qk_int8=True)
    finally:
        pl.pallas_call = orig
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 2e-2, rel
    # and it must actually differ from the exact kernel (int8 really on)
    assert err.max() > 1e-6


def test_quantize_rows_roundtrip(rng):
    from tclight_tpu.ops.attention import _quantize_rows

    x = jnp.asarray(rng.standard_normal((2, 5, 3, 40)).astype(np.float32))
    q8, s = _quantize_rows(x)
    assert q8.dtype == jnp.int8 and s.shape == (2, 5, 3)
    back = np.asarray(q8, np.float32) * np.asarray(s)[..., None]
    amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
    np.testing.assert_allclose(back, np.asarray(x), atol=float(amax.max()) / 127 * 0.51)
