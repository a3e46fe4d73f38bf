"""Token-merge ops: round-trip invariants + oracle parity vs the reference
implementation (imported from /root/reference for testing only)."""

import importlib.util
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.ops.tome import (
    compute_local_merge,
    compute_split_merge,
    global_merge,
    global_unmerge,
    join_frame,
    local_merge_sequence,
    local_unmerge_sequence,
    plan_local_levels,
    split_frame,
    tome_merge,
    tome_unmerge,
)


def _load_reference_merge():
    spec = importlib.util.spec_from_file_location(
        "ref_merge", "/root/reference/utils/VidToMe/vidtome/merge.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_plan_levels_basic():
    levels = plan_local_levels(4, 10, 0.6, target_stride=4)
    assert len(levels) == 1
    (lv,) = levels
    assert lv.n_dst_frames == 1 and lv.n_src == 30 and lv.n_dst == 10
    assert lv.r == 18  # int(30 * 0.6)


def test_plan_levels_recursive():
    levels = plan_local_levels(8, 5, 0.5, target_stride=4)
    assert len(levels) == 2
    assert levels[0].f == 8 and levels[0].n_dst_frames == 2
    assert levels[0].r == int(6 * 5 * 0.5)
    unm0 = levels[0].n_src - levels[0].r
    assert levels[1].f == 2 and levels[1].unm_pre == unm0
    assert levels[1].stride == 2 and levels[1].n_dst_frames == 1


def test_plan_levels_rejects_ragged():
    with pytest.raises(ValueError):
        plan_local_levels(6, 4, 0.5, target_stride=4)


def test_join_split_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((6, 5, 7)).astype(np.float32))
    assert np.allclose(split_frame(join_frame(x, 3), 3), x)


@pytest.mark.parametrize("align_batch", [True, False])
def test_merge_unmerge_roundtrip_replace(rng, align_batch):
    """replace mode: unmerge(merge(x)) keeps dst and unmerged-src tokens
    exactly; merged src tokens take their matched dst value."""
    b, f, t, c = 2, 4, 6, 8
    x = jnp.asarray(rng.standard_normal((b, f * t, c)).astype(np.float32))
    (spec,) = plan_local_levels(f, t, 0.5, target_stride=4)
    mi = compute_local_merge(x, spec, jnp.int32(1), align_batch)
    merged = tome_merge(x, mi)
    assert merged.shape == (b, (spec.n_src - spec.r) + spec.n_dst, c)
    restored = tome_unmerge(merged, mi)
    assert restored.shape == x.shape
    xr = np.asarray(restored)
    xo = np.asarray(x)
    b_idx = np.asarray(mi.b_idx)
    np.testing.assert_allclose(xr[:, b_idx], xo[:, b_idx], atol=1e-6)
    # unmerged src positions restored exactly
    a_idx = np.asarray(mi.a_idx)
    for bi in range(b):
        row = 0 if np.asarray(mi.unm_idx).shape[0] == 1 else bi
        unm_pos = a_idx[np.asarray(mi.unm_idx)[row]]
        np.testing.assert_allclose(xr[bi, unm_pos], xo[bi, unm_pos], atol=1e-6)
        # merged src tokens equal their dst token value
        src_pos = a_idx[np.asarray(mi.src_idx)[row]]
        dst_val = xo[:, b_idx][bi][np.asarray(mi.dst_idx)[row]]
        np.testing.assert_allclose(xr[bi, src_pos], dst_val, atol=1e-6)


@pytest.mark.slow
def test_identical_frames_full_merge(rng):
    """ratio=1 on identical frames: restored == original."""
    b, f, t, c = 1, 4, 5, 4
    frame = rng.standard_normal((b, t, c)).astype(np.float32)
    x = jnp.asarray(np.tile(frame, (1, f, 1)))
    levels = plan_local_levels(f, t, 1.0, target_stride=4)
    merged, infos = local_merge_sequence(x, x, levels, jnp.int32(2))
    assert merged.shape[1] == t  # fully merged to one frame
    restored = local_unmerge_sequence(merged, infos)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x), atol=1e-5)


@pytest.mark.slow
def test_recursive_merge_roundtrip(rng):
    b, f, t, c = 1, 8, 4, 6
    x = jnp.asarray(rng.standard_normal((b, f * t, c)).astype(np.float32))
    levels = plan_local_levels(f, t, 0.5, target_stride=4)
    merged, infos = local_merge_sequence(x, x, levels, jnp.int32(0))
    restored = local_unmerge_sequence(merged, infos)
    assert restored.shape == x.shape
    # dst tokens of the final level survive exactly: spot-check overall
    # shape plausibility + all tokens finite
    assert np.isfinite(np.asarray(restored)).all()


@pytest.mark.parametrize("align_batch", [True, False])
@pytest.mark.parametrize("mode", ["replace", "mean"])
def test_local_merge_parity_with_reference(rng, align_batch, mode):
    import torch

    ref = _load_reference_merge()
    b, f, t, c = 2, 4, 7, 5
    ratio = 0.6
    metric_np = rng.standard_normal((b, f * t, c)).astype(np.float32)
    metric_t = torch.from_numpy(metric_np)

    gen = torch.Generator().manual_seed(42)
    gen_probe = torch.Generator().manual_seed(42)
    randf = int(torch.randint(0, 4, [1], generator=gen_probe))

    m, u, ret = ref.bipartite_soft_matching_randframe(
        metric_t, f, ratio, 0, gen, target_stride=4, align_batch=align_batch,
        merge_mode=mode,
    )
    x_np = rng.standard_normal((b, f * t, c)).astype(np.float32)
    ref_merged = m(torch.from_numpy(x_np), mode=mode).numpy()
    ref_restored = u(torch.from_numpy(ref_merged)).numpy()

    (spec,) = plan_local_levels(f, t, ratio, target_stride=4)
    mi = compute_local_merge(jnp.asarray(metric_np), spec, jnp.int32(randf), align_batch)
    ours_merged = np.asarray(tome_merge(jnp.asarray(x_np), mi, mode))
    np.testing.assert_allclose(ours_merged, ref_merged, atol=1e-5)
    ours_restored = np.asarray(tome_unmerge(jnp.asarray(ours_merged), mi))
    np.testing.assert_allclose(ours_restored, ref_restored, atol=1e-5)


@pytest.mark.parametrize("align_batch", [True, False])
def test_split_merge_parity_with_reference(rng, align_batch):
    import torch

    ref = _load_reference_merge()
    b, n, c = 2, 24, 5
    src_len = 12
    ratio = 0.5
    metric_np = rng.standard_normal((b, n, c)).astype(np.float32)
    for unmerge_chunk in (0, 1):
        m, u, _ = ref.bipartite_soft_matching_2s(
            torch.from_numpy(metric_np), src_len, ratio, align_batch,
            unmerge_chunk=unmerge_chunk,
        )
        x_np = rng.standard_normal((b, n, c)).astype(np.float32)
        ref_merged = m(torch.from_numpy(x_np)).numpy()
        ref_restored = u(torch.from_numpy(ref_merged)).numpy()

        mi = compute_split_merge(jnp.asarray(metric_np), src_len, ratio, align_batch)
        ours_merged = np.asarray(tome_merge(jnp.asarray(x_np), mi))
        np.testing.assert_allclose(ours_merged, ref_merged, atol=1e-5)
        full = np.asarray(tome_unmerge(jnp.asarray(ours_merged), mi))
        ours_restored = full[:, :src_len] if unmerge_chunk == 0 else full[:, src_len:]
        np.testing.assert_allclose(ours_restored, ref_restored, atol=1e-5)


def test_global_merge_flip_shapes(rng):
    b, l, c = 2, 10, 4
    local = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    bank = jnp.asarray(rng.standard_normal((b, l, c)).astype(np.float32))
    for flip_val in (False, True):
        flip = jnp.asarray(flip_val)
        merged, mi, _ = global_merge(local, bank, local, bank, 0.5, flip)
        restored_local = global_unmerge(merged, mi, flip, l)
        assert restored_local.shape == local.shape


def test_greedy_match_chunked_equals_naive(rng):
    """The online-chunked align-batch matcher (used above the memory
    threshold) must reproduce the naive matcher exactly (no ties in
    random float inputs)."""
    import jax.numpy as jnp

    from tclight_tpu.ops import tome

    b, s, c = 3, 70, 16
    metric = jnp.asarray(rng.standard_normal((b, 2 * s, c)).astype(np.float32))
    mn = metric / jnp.linalg.norm(metric, axis=-1, keepdims=True)
    a_idx = jnp.arange(s, dtype=jnp.int32)
    b_idx = jnp.arange(s, 2 * s, dtype=jnp.int32)
    r = 30
    naive = tome._greedy_match(metric, a_idx, b_idx, r, True)
    # force multiple dst chunks to exercise the online max/argmax fold
    orig = tome._MATCH_CHUNK
    tome._MATCH_CHUNK = 16
    try:
        chunked = tome._greedy_match_chunked(mn, a_idx, b_idx, r)
    finally:
        tome._MATCH_CHUNK = orig
    for x, y in zip(naive, chunked):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
