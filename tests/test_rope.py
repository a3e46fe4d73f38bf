"""RoPE family parity vs the reference embedding module
(cosmos1/models/autoregressive/modules/embedding.py), imported directly as
the test oracle (cuda calls patched to cpu)."""

import importlib.util
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.models.rope import (
    RopeSpec, apply_rope_tables, build_rope_tables, yarn_mscale,
    yarn_scale_factors)

REF = "/root/reference/cosmos1/models/autoregressive/modules/embedding.py"


@pytest.fixture(scope="module")
def ref_embedding(request):
    """Load the reference module standalone with cuda patched out."""
    import torch

    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    if not torch.cuda.is_available():
        torch.cuda.current_device = lambda: torch.device("cpu")
    spec = importlib.util.spec_from_file_location("ref_embedding", REF)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_embedding"] = mod
    spec.loader.exec_module(mod)
    yield mod
    torch.Tensor.cuda = orig_cuda


def _ref_v1(ref_embedding, **kw):
    return ref_embedding.RotaryPositionEmbeddingPytorchV1(**kw)


def _ref_v2(ref_embedding, seq_len, **kw):
    return ref_embedding.RotaryPositionEmbeddingPytorchV2(
        seq_len=seq_len, **kw)


def _compare_qk(rope_ref, spec, head_dim, q, k, seq_len, atol=2e-5):
    import torch

    tables = jnp.asarray(build_rope_tables(spec, head_dim, seq_len))
    qt = torch.from_numpy(q)
    kt = torch.from_numpy(k)
    q_ref, k_ref = rope_ref(qt, kt, seq_len=seq_len)
    pos = jnp.arange(seq_len)
    q_ours = apply_rope_tables(jnp.asarray(q), tables, pos, spec.variant)
    k_ours = apply_rope_tables(jnp.asarray(k), tables, pos, spec.variant)
    np.testing.assert_allclose(np.asarray(q_ours), q_ref.numpy(), atol=atol)
    np.testing.assert_allclose(np.asarray(k_ours), k_ref.numpy(), atol=atol)


def test_rope_v1_1d_parity(ref_embedding, rng):
    d, s = 32, 24
    ref = _ref_v1(ref_embedding, dim=d, max_position_embeddings=s,
                  rope_theta=10000.0)
    spec = RopeSpec(variant="v1", rope_dim="1D", theta=10000.0,
                    max_position_embeddings=s)
    q = rng.normal(size=(2, s, 3, d)).astype(np.float32)
    k = rng.normal(size=(2, s, 3, d)).astype(np.float32)
    _compare_qk(ref, spec, d, q, k, s)


def test_rope_v1_1d_yarn_parity(ref_embedding, rng):
    d, s = 32, 64
    kw = dict(dim=d, max_position_embeddings=s,
              original_max_position_embeddings=16, rope_theta=10000.0,
              apply_yarn=True, scale=4.0, beta_fast=32, beta_slow=1,
              attn_factor=1)
    ref = _ref_v1(ref_embedding, **kw)
    spec = RopeSpec(variant="v1", rope_dim="1D", theta=10000.0,
                    max_position_embeddings=s,
                    original_max_position_embeddings=16, apply_yarn=True,
                    scale=4.0)
    q = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    k = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    _compare_qk(ref, spec, d, q, k, s)


def test_rope_v2_1d_parity(ref_embedding, rng):
    d, s = 32, 24
    ref = _ref_v2(ref_embedding, seq_len=s, dim=d,
                  max_position_embeddings=s, rope_theta=10000.0)
    spec = RopeSpec(variant="v2", rope_dim="1D", theta=10000.0,
                    max_position_embeddings=s)
    q = rng.normal(size=(2, s, 3, d)).astype(np.float32)
    k = rng.normal(size=(2, s, 3, d)).astype(np.float32)
    _compare_qk(ref, spec, d, q, k, s)


def test_rope_v1_3d_parity(ref_embedding, rng):
    d = 48
    t, h, w = 3, 4, 5
    s = t * h * w
    ref = _ref_v1(ref_embedding, dim=d, rope_dim="3D", latent_shape=[t, h, w],
                  rope_theta=10000.0, max_position_embeddings=s)
    spec = RopeSpec(variant="v1", rope_dim="3D", theta=10000.0,
                    latent_shape=(t, h, w))
    q = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    k = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    _compare_qk(ref, spec, d, q, k, s)


def test_rope_v1_3d_yarn_parity(ref_embedding, rng):
    d = 48
    t, h, w = 4, 3, 3
    s = t * h * w
    ref = _ref_v1(ref_embedding, dim=d, rope_dim="3D", latent_shape=[t, h, w],
                  original_latent_shape=[2, 2, 2], rope_theta=10000.0,
                  apply_yarn=True, scale=2.0, beta_fast=32, beta_slow=1,
                  max_position_embeddings=s)
    spec = RopeSpec(variant="v1", rope_dim="3D", theta=10000.0,
                    latent_shape=(t, h, w), original_latent_shape=(2, 2, 2),
                    apply_yarn=True, scale=2.0)
    q = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    k = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    _compare_qk(ref, spec, d, q, k, s)


def test_rope_v2_2d_parity(ref_embedding, rng):
    d = 32
    h, w = 4, 6
    s = h * w
    ref = _ref_v2(ref_embedding, seq_len=s, dim=d, rope_dim="2D",
                  latent_shape=[h, w], rope_theta=10000.0,
                  max_position_embeddings=s)
    spec = RopeSpec(variant="v2", rope_dim="2D", theta=10000.0,
                    latent_shape=(h, w))
    q = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    k = rng.normal(size=(1, s, 2, d)).astype(np.float32)
    _compare_qk(ref, spec, d, q, k, s)


def test_yarn_helpers():
    inv = 1.0 / (10000.0 ** (np.arange(0, 32, 2) / 32))
    sf = yarn_scale_factors(inv, 1024, 32, 1, 8.0)
    assert sf.shape == inv.shape
    assert np.all(sf <= 1.0 + 1e-9) and np.all(sf >= 1 / 8.0 - 1e-9)
    # high freqs keep scale 1, low freqs get 1/scale
    assert sf[0] == pytest.approx(1.0)
    assert sf[-1] == pytest.approx(1 / 8.0)
    assert yarn_mscale(1.0) == 1.0
    assert yarn_mscale(8.0) == pytest.approx(0.1 * np.log(8.0) + 1.0)


def test_v1_1d_matches_legacy_apply(rng):
    """The new tables/apply reproduce ar_transformer's existing
    rope_frequencies/apply_rope exactly (checkpoint-parity invariant)."""
    from tclight_tpu.models.ar_transformer import apply_rope, rope_frequencies

    d, s = 64, 16
    legacy = rope_frequencies(d, s, 500000.0)
    spec = RopeSpec(variant="v1", rope_dim="1D", theta=500000.0,
                    max_position_embeddings=s)
    tables = jnp.asarray(build_rope_tables(spec, d, s))
    x = rng.normal(size=(2, s, 4, d)).astype(np.float32)
    pos = jnp.arange(s)
    a = apply_rope(jnp.asarray(x), legacy, pos)
    b = apply_rope_tables(jnp.asarray(x), tables, pos, "v1")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
