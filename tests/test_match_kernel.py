"""Fused matmul+argmax matcher kernel (ops/match_kernel.py) vs the dense
XLA oracle — exact equality, including dense-path (b-major first
occurrence) tie semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tclight_tpu.ops.match_kernel import (
    online_argmax_scores, online_argmax_scores_xla)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize(
    "b,s,d,c",
    [(2, 300, 500, 64), (3, 1024, 2048, 320), (1, 130, 257, 40),
     (8, 512, 777, 128)],
)
def test_kernel_matches_dense(rng, b, s, d, c):
    a = jnp.asarray(rng.standard_normal((b, s, c)), jnp.float32)
    bt = jnp.asarray(rng.standard_normal((b, d, c)), jnp.float32)
    m1, i1 = online_argmax_scores(a, bt, interpret=True)
    m2, i2 = online_argmax_scores_xla(a, bt)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_tie_semantics_first_b_major():
    # all scores equal -> the dense argmax picks global index 0 (b-major
    # first occurrence); the kernel's strict-greater running update must
    # reproduce that
    a = jnp.ones((2, 8, 16))
    bt = jnp.ones((2, 32, 16))
    m1, i1 = online_argmax_scores(a, bt, interpret=True)
    m2, i2 = online_argmax_scores_xla(a, bt)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert (np.asarray(i1) == 0).all()


def test_greedy_match_chunked_kernel_gate(rng, monkeypatch):
    """The size gate routes huge problems to the kernel; results must be
    identical to the scan path (interpret mode on CPU)."""
    import tclight_tpu.ops.tome as tome
    import tclight_tpu.utils.device as device
    from tclight_tpu.ops import match_kernel

    b, s, d, c = 2, 96, 160, 16
    mn = jnp.asarray(rng.standard_normal((b, s + d, c)), jnp.float32)
    a_idx = jnp.arange(s, dtype=jnp.int32)
    b_idx = jnp.arange(s, s + d, dtype=jnp.int32)
    out_scan = jax.tree.map(
        np.asarray, tome._greedy_match_chunked(mn, a_idx, b_idx, s // 2))

    monkeypatch.setattr(device, "use_pallas", lambda: True)
    monkeypatch.setattr(tome, "_KERNEL_MATCH_MIN_ELEMS", 0)
    orig = match_kernel.online_argmax_scores
    monkeypatch.setattr(
        match_kernel, "online_argmax_scores",
        lambda a, bt, **kw: orig(a, bt, interpret=True))
    out_kernel = jax.tree.map(
        np.asarray, tome._greedy_match_chunked(mn, a_idx, b_idx, s // 2))
    for x, y in zip(out_scan, out_kernel):
        np.testing.assert_array_equal(x, y)
