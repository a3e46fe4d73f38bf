"""Native C++ track machinery vs the jitted JAX implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu import native
from tclight_tpu.ops.flow import get_flowid, voxelization

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_flowid_native_matches_jax():
    rng = np.random.default_rng(0)
    n, h, w = 4, 12, 14
    frames = np.zeros((n, h, w, 3), np.float32)
    base = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
    for t in range(n):
        frames[t] = np.roll(base, 2 * t, axis=1)
    flows = np.zeros((n, h, w, 2), np.float32)
    flows[..., 0] = 2.0
    masks = np.ones((n, h, w), np.float32)

    jax_ids = np.asarray(
        get_flowid(jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks))
    )
    nat_ids = native.get_flowid_native(frames, flows, masks)
    assert nat_ids.shape == jax_ids.shape
    # track partitions must agree exactly: same-id pixel groups
    _, inv_a = np.unique(jax_ids.reshape(-1), return_inverse=True)
    _, inv_b = np.unique(nat_ids.reshape(-1), return_inverse=True)
    # canonical relabeling: first occurrence order
    def canon(inv):
        seen = {}
        out = np.empty_like(inv)
        for i, v in enumerate(inv):
            if v not in seen:
                seen[v] = len(seen)
            out[i] = seen[v]
        return out
    np.testing.assert_array_equal(canon(inv_a), canon(inv_b))


def test_unique_inverse_native():
    ids = np.array([5, 3, 5, 9, 3, 3], np.int32)
    inv, n_unique = native.unique_inverse_native(ids)
    assert n_unique == 3
    np.testing.assert_array_equal(inv, voxelization(ids))


def test_segment_mean_native(rng):
    vals = rng.standard_normal((10, 3)).astype(np.float32)
    inv = np.array([0, 0, 1, 1, 1, 2, 2, 2, 2, 0], np.int32)
    out = native.segment_mean_native(vals, inv, 3)
    for t in range(3):
        np.testing.assert_allclose(out[t], vals[inv == t].mean(axis=0),
                                   atol=1e-5)
