"""RAFT: shape tests on a tiny config + flow recovery on synthetic motion
is NOT expected with random weights, so we test machinery invariants:
correlation math, lookup parity dense-vs-gather, convex upsampling."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.raft import (
    RAFT,
    RAFTConfig,
    convex_upsample,
    corr_lookup,
    corr_lookup_chunked,
    corr_pyramid,
)


def test_corr_pyramid_self_peak(rng):
    """Correlation of a map with itself peaks on the diagonal."""
    f = jnp.asarray(rng.standard_normal((1, 8, 8, 16)).astype(np.float32))
    pyr = corr_pyramid(f, f, levels=2)
    corr0 = np.asarray(pyr[0])[0]  # (64, 8, 8)
    flat = corr0.reshape(64, 64)
    assert (flat.argmax(axis=1) == np.arange(64)).mean() > 0.9
    assert pyr[1].shape == (1, 64, 4, 4)


def test_corr_lookup_center_matches_dense(rng):
    f1 = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 6, 6, 8)).astype(np.float32))
    pyr = corr_pyramid(f1, f2, levels=1)
    ys, xs = np.meshgrid(np.arange(6), np.arange(6), indexing="ij")
    coords = jnp.asarray(
        np.stack([xs, ys], -1)[None].astype(np.float32)
    )
    out = np.asarray(corr_lookup(pyr, coords, radius=1))  # (1,6,6,9)
    # center tap (offset 0,0) == corr at own position
    corr = np.asarray(pyr[0])[0].reshape(36, 6, 6)
    centers = np.array([corr[i, i // 6, i % 6] for i in range(36)])
    np.testing.assert_allclose(out[0, :, :, 4].reshape(-1), centers, atol=1e-4)


def test_corr_lookup_chunked_close_to_dense(rng):
    """Level-0 of the chunked path must match the dense path exactly
    (no pooling at level 0)."""
    f1 = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((1, 8, 8, 8)).astype(np.float32))
    ys, xs = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1)[None].astype(np.float32))
    dense = np.asarray(corr_lookup(corr_pyramid(f1, f2, 1), coords, radius=2))
    chunked = np.asarray(
        corr_lookup_chunked(f1, f2, coords, levels=1, radius=2, chunk=16)
    )
    np.testing.assert_allclose(chunked, dense, atol=1e-4, rtol=1e-4)


def test_convex_upsample_constant_flow():
    flow = jnp.ones((1, 4, 4, 2)) * 2.0
    mask = jnp.zeros((1, 4, 4, 64 * 9))
    up = np.asarray(convex_upsample(flow, mask))
    assert up.shape == (1, 32, 32, 2)
    # uniform mask (softmax of zeros) + constant flow -> 8 * flow in the
    # interior (borders see zero-padded neighborhoods, as in the reference)
    np.testing.assert_allclose(up[:, 8:-8, 8:-8], 16.0, atol=1e-5)


@pytest.mark.slow
def test_raft_forward_shapes(rng):
    cfg = RAFTConfig.tiny()
    model = RAFT(cfg)
    a = jnp.asarray(rng.uniform(size=(1, 32, 40, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 32, 40, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), a, b, iters=2)
    flow_up, flow8 = model.apply(params, a, b, iters=2)
    assert flow_up.shape == (1, 32, 40, 2)
    assert flow8.shape == (1, 4, 5, 2)
    assert np.isfinite(np.asarray(flow_up)).all()
