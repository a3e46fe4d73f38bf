"""Banded (windowed) palette gather: planner, kernel (interpret mode on
CPU), and the UVT fast-path integration.

The kernel is the TPU fast path for the reference's palette render +
scatter-mean adjoint (generate.py:477-532); correctness target is exact
f32 equality with the plain XLA gather / dense inverse-map adjoint.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tclight_tpu.ops import banded_gather as bg
from tclight_tpu.pipeline import postopt as po


def _roll_ids(n, h, w, shift=3):
    """Per-row rolling ids: near-monotone per frame (bench-like flow)."""
    base = np.arange(h * w).reshape(h, w)
    return np.stack(
        [np.roll(base, -shift * t, axis=1) for t in range(n)]
    ).reshape(n, h * w)


def test_planner_banded_ok_and_fallback():
    ids = _roll_ids(3, 8, 512)
    seg, st, offs, ok = bg.plan_banded_gather_rows(ids)
    assert ok
    nb = bg.row_blocks(ids.shape[1])
    assert st.shape == (3, nb) and offs.shape == (3, nb, 512)
    # generation-mixed ids (far-apart ranges inside one block) must fail
    bad = ids.copy()
    bad[1, ::7] = bad[1, ::7] + 10_000_000
    assert not bg.plan_banded_gather_rows(bad)[3]


def test_planner_row_end_padding_does_not_break_segments():
    """Row length not a multiple of block*group: the padded (all-masked)
    tail blocks of each row must inherit a neighboring window start —
    lo=0 there used to blow the per-group segment span whenever live ids
    sat near the table end (the 720x960 production shape)."""
    h, w = 12, 300  # L = 3600, pads to 4096 with 1 dead block
    base = np.arange(h * w) + 500_000  # live ids far from zero
    ids = np.stack([np.roll(base.reshape(h, w), -t, axis=1).reshape(-1)
                    for t in range(3)])
    seg, st, offs, ok = bg.plan_banded_gather_rows(ids)
    assert ok
    # leading dead blocks backfill from the next live block
    lead = ids.copy()
    lead[:, :512] = -1
    assert bg.plan_banded_gather_rows(lead)[3]


def test_planner_masks_negative_indices():
    ids = _roll_ids(2, 8, 512).astype(np.int64)
    ids[0, 100:200] = -1
    seg, st, offs, ok = bg.plan_banded_gather_rows(ids)
    assert ok
    assert (offs[0].reshape(-1)[100:200] == -1).all()


@pytest.mark.slow
def test_kernel_matches_xla_gather_interpret():
    # small window/block keep Pallas interpret mode tractable on CPU
    blk, win = 256, 1024
    ids = _roll_ids(1, 8, 256)
    ids[0, 50:60] = -1  # masked entries -> zero rows
    seg, st, offs, ok = bg.plan_banded_gather_rows(ids, block=blk,
                                                   window=win)
    assert ok
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((ids.max() + 1, 3)),
                        jnp.float32)
    packed = bg.pack_table(table, window=win, block=blk)
    out = bg.banded_gather(packed, jnp.asarray(seg).reshape(-1),
                           jnp.asarray(st).reshape(-1),
                           jnp.asarray(offs).reshape(-1, blk),
                           window=win,
                           interpret=jax.default_backend() != "tpu")
    ref = bg.banded_gather_xla(table, jnp.asarray(st).reshape(-1),
                               jnp.asarray(offs).reshape(-1, blk))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.fixture(scope="module")
def uvt_case():
    rng = np.random.default_rng(0)
    n, h, w = 4, 16, 256
    ids = _roll_ids(n, h, w).copy()
    ids[2, 100] = ids[2, 101]  # warp collision -> overflow path
    ids[3, 7] = ids[3, 8]
    p = int(ids.max()) + 1
    p_pad = max(128, -(-p // 128) * 128)
    feats = jnp.asarray(rng.standard_normal((p_pad, 3)), jnp.float32)
    return n, h, w, ids, p_pad, feats


@pytest.mark.slow
def test_uvt_banded_tables_activate_and_match_dense(uvt_case):
    n, h, w, ids, p_pad, feats = uvt_case
    tb, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=True)
    td, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=False)
    assert len(tb) == 10 and len(td) == 4
    idx = jnp.asarray([1, 3, 0])
    fb = po.uvt_gather(feats, tb, idx, hw=h * w)
    fd = po.uvt_gather(feats, td, idx, hw=h * w)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))


@pytest.mark.slow
def test_uvt_banded_adjoint_exact(uvt_case):
    n, h, w, ids, p_pad, feats = uvt_case
    tb, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=True)
    td, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=False)
    idx = jnp.asarray([2, 0])
    rng = np.random.default_rng(1)
    cot = jnp.asarray(rng.standard_normal((2, h * w, 3)), jnp.float32)
    gb = jax.vjp(lambda f: po.uvt_gather(f, tb, idx, hw=h * w), feats)[1](cot)[0]
    gd = jax.vjp(lambda f: po.uvt_gather(f, td, idx, hw=h * w), feats)[1](cot)[0]
    np.testing.assert_array_equal(np.asarray(gb), np.asarray(gd))


@pytest.mark.slow
def test_uvt_banded_tolerates_sparse_generation_mixing():
    """Real tracked ids (get_flowid) mix a few fresh far-band track ids
    into near-monotone scanline blocks; the robust planner must still
    activate (window-miss entries go through the overflow patch) and
    both directions must stay EXACT vs the dense path."""
    n, h, w = 3, 8, 512
    hw = h * w
    ids = _roll_ids(n, h, w).copy()
    # ~3% of frame 1/2 pixels hold later-generation tracks: scanline-
    # ordered among themselves (as get_flowid assigns), far from frame 0
    fresh = np.arange(hw // 32) + hw + 100
    ids[1, ::32] = fresh
    ids[2, 5::32] = fresh + hw // 32
    p_pad = max(128, -(-int(ids.max() + 1) // 128) * 128)
    tb, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=True)
    td, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=False)
    assert len(tb) == 10, "robust plan should tolerate sparse mixing"
    feats = jnp.asarray(
        np.random.default_rng(2).standard_normal((p_pad, 3)), jnp.float32)
    idx = jnp.asarray([2, 1, 0])
    fb = po.uvt_gather(feats, tb, idx, hw=hw)
    fd = po.uvt_gather(feats, td, idx, hw=hw)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((3, hw, 3)), jnp.float32)
    gb = jax.vjp(lambda f: po.uvt_gather(f, tb, idx, hw=hw), feats)[1](cot)[0]
    gd = jax.vjp(lambda f: po.uvt_gather(f, td, idx, hw=hw), feats)[1](cot)[0]
    # tracks mixing in-window and overflow contributions sum in a
    # different order than the dense path -> ulp-level reassociation;
    # exact zeros are still preserved (all-zero sums are exact)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                               rtol=0, atol=1e-5)
    zero_rows = np.asarray(jnp.all(gd == 0, axis=1))
    assert np.abs(np.asarray(gb)[zero_rows]).max(initial=0) == 0


def _multi_band_ids(n, h, w, bands=3, seed=0):
    """Per-frame ids mixing `bands` creation generations inside every
    scanline block (each generation scanline-ordered among itself) — the
    structure real `get_flowid` ids develop by frame ~300, where no
    single window covers a block (PERF_NOTES round 3)."""
    hw = h * w
    ids = _roll_ids(n, h, w).copy()
    for g in range(1, bands):
        m = np.zeros(hw, bool)
        m[g::bands] = True
        gen = np.arange(m.sum()) + g * (hw + 40_000) + 177
        for t in range(1, n):
            ids[t, np.roll(m, 3 * t * g)] = gen
    return ids


def test_multi_window_planner_covers_multi_band():
    ids = _multi_band_ids(3, 8, 512)
    # single-window robust planning must NOT cover this (that is the
    # whole point of the K-window planner)
    assert not bg.plan_banded_gather_rows_robust(ids)[-1]
    seg, st, offs, op, oi, ok = bg.plan_banded_gather_rows_multi(
        ids, n_windows=3)
    assert ok
    nb = bg.row_blocks(ids.shape[1])
    assert st.shape == (3, nb, 3) and seg.shape[2] == 3
    assert offs.max() < 3 * 2048


def test_multi_window_kernel_matches_xla_interpret():
    blk, win, k = 256, 512, 3
    ids = _multi_band_ids(1, 4, 256, bands=3)
    ids[0, 40:50] = -1  # masked entries -> zero rows
    seg, st, offs, op, oi, ok = bg.plan_banded_gather_rows_multi(
        ids, block=blk, window=win, n_windows=k)
    assert ok
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((int(ids.max()) + 1, 3)),
                        jnp.float32)
    packed = bg.pack_table(table, window=win, block=blk)
    out = bg.banded_gather_multi(
        packed, jnp.asarray(seg).reshape(-1, k),
        jnp.asarray(st).reshape(-1, k), jnp.asarray(offs).reshape(-1, blk),
        window=win, interpret=jax.default_backend() != "tpu")
    ref = bg.banded_gather_xla_multi(
        table, jnp.asarray(st).reshape(-1, k),
        jnp.asarray(offs).reshape(-1, blk), window=win)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # masked entries are zero rows
    assert np.abs(np.asarray(out).reshape(-1, 3)[40:50]).max() == 0


@pytest.mark.slow
def test_uvt_multi_window_tables_match_dense():
    """Multi-band ids activate the K-window banded path in
    build_uvt_tables and stay EXACT vs the dense inverse-map path, both
    directions."""
    n, h, w = 3, 8, 512
    hw = h * w
    ids = _multi_band_ids(n, h, w)
    p_pad = max(128, -(-int(ids.max() + 1) // 128) * 128)
    tb, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=True)
    td, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=False)
    assert len(tb) == 10 and tb[1].ndim == 3, "K-window plans expected"
    feats = jnp.asarray(
        np.random.default_rng(2).standard_normal((p_pad, 3)), jnp.float32)
    idx = jnp.asarray([2, 0])
    fb = po.uvt_gather(feats, tb, idx, hw=hw)
    fd = po.uvt_gather(feats, td, idx, hw=hw)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, hw, 3)), jnp.float32)
    gb = jax.vjp(lambda f: po.uvt_gather(f, tb, idx, hw=hw), feats)[1](cot)[0]
    gd = jax.vjp(lambda f: po.uvt_gather(f, td, idx, hw=hw), feats)[1](cot)[0]
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                               rtol=0, atol=1e-5)


def _rolling_flowid_ids(n, h, w, shift=2):
    """Emulate get_flowid on a rolling video: pixels shift right by
    `shift` px/frame, new tracks are born at the left edge each frame in
    scanline order.  By frame n the regenerated arc is a ~h ids/px RAMP
    (creation generations interleave by column strip) that no gather
    window covers — the structure that rejected the banded planner at
    300x1280x720 (PERF_NOTES round 3)."""
    hw = h * w
    next_id = hw
    grid = np.arange(hw).reshape(h, w)
    frames = [grid.copy()]
    for _ in range(1, n):
        g = np.empty_like(grid)
        g[:, shift:] = frames[-1][:, :-shift]
        g[:, :shift] = np.arange(h * shift).reshape(h, shift) + next_id
        next_id += h * shift
        frames.append(g)
    return np.stack([f.reshape(-1) for f in frames])


@pytest.mark.slow
def test_uvt_kinematic_relabel_restores_banded():
    """Ramp-structured ids reject both the single- and K-window planners
    on raw creation-order ids, but kinematic relabeling (tracks ranked by
    mean scanline position) restores a banded structure; results must
    stay EXACT vs the dense path computed on the RAW ids."""
    n, h, w = 64, 64, 512
    hw = h * w
    ids = _rolling_flowid_ids(n, h, w, shift=8)
    sample = ids[:: n // 4][:4]
    assert not bg.plan_banded_gather_rows_robust(sample)[-1]
    assert not bg.plan_banded_gather_rows_multi(sample, n_windows=3)[-1]
    rel = po.kinematic_relabel(ids, -(-int(ids.max() + 1) // 128) * 128)
    assert (bg.plan_banded_gather_rows_robust(rel[:: n // 4][:4])[-1]
            or bg.plan_banded_gather_rows_multi(
                rel[:: n // 4][:4], n_windows=2)[-1])
    p_pad = -(-int(ids.max() + 1) // 128) * 128
    tb, inv_b = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                    allow_banded=True)
    td, inv_d = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                    allow_banded=False)
    assert len(tb) == 10, "relabeled banded path should activate"
    # the relabeling is a permutation: same per-frame track multisets
    assert np.array_equal(np.sort(np.unique(inv_b)), np.sort(np.unique(inv_d)))
    rng = np.random.default_rng(5)
    feats_raw = jnp.asarray(rng.standard_normal((p_pad, 3)), jnp.float32)
    # express the same per-track features in both numberings via the
    # pixel correspondence (inv_d[i] -> inv_b[i] is the id permutation)
    perm = np.full(p_pad, -1, np.int64)
    perm[inv_d.reshape(-1)] = inv_b.reshape(-1)
    used = perm >= 0
    feats_b = np.zeros((p_pad, 3), np.float32)
    feats_b[perm[used]] = np.asarray(feats_raw)[used]
    feats_b = jnp.asarray(feats_b)
    idx = jnp.asarray([0, n - 1, n // 2])
    fb = po.uvt_gather(feats_b, tb, idx, hw=hw)
    fd = po.uvt_gather(feats_raw, td, idx, hw=hw)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))
    cot = jnp.asarray(rng.standard_normal((3, hw, 3)), jnp.float32)
    gb = jax.vjp(lambda f: po.uvt_gather(f, tb, idx, hw=hw), feats_b)[1](cot)[0]
    gd = jax.vjp(lambda f: po.uvt_gather(f, td, idx, hw=hw), feats_raw)[1](cot)[0]
    gb_np, gd_np = np.asarray(gb), np.asarray(gd)
    np.testing.assert_allclose(gb_np[perm[used]], gd_np[used],
                               rtol=0, atol=1e-5)


def test_uvt_tables_fall_back_on_incoherent_ids():
    """The SAME tracks in inconsistent relative order across frames: a
    stride permutation makes every scanline block of frame 1 span the
    whole id range, and because frame 0 pins the natural order, no
    renumbering (kinematic relabeling included) can make both frames
    near-monotone — build_uvt_tables must decline the banded path and
    fall back to the dense/sorted adjoint.  (Random DISJOINT per-frame
    ids are NOT such a case: tracks seen in one frame relabel to their
    single position's rank, which the planner then covers.)"""
    # id space >> K*window (otherwise 2-3 windows trivially cover it)
    n, h, w = 2, 64, 1024
    hw = h * w
    base = np.arange(hw, dtype=np.int32)
    ids = np.stack([base, (base * 1234567) % hw])
    p_pad = max(128, -(-int(ids.max() + 1) // 128) * 128)
    tables, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                    allow_banded=True)
    assert len(tables) in (3, 4)  # dense/sorted fallback, not banded


@pytest.mark.slow  # interpret-mode kernels at window 4096
def test_call_chunking_and_density_geometry_match_xla(monkeypatch):
    """SMEM-bounded row chunking (the scalar-prefetch arrays blow the
    ~1 MB SMEM at 300-frame/3.5M-track scale) and non-default density
    geometry (window 4096 / slope>2) must be exact vs the XLA path."""
    import numpy as np

    from tclight_tpu.ops import banded_gather as bg

    rng = np.random.default_rng(7)
    # minimal shapes that still force window>2048 geometry AND >1 chunk:
    # interpret mode costs ~minutes per extra row-block at this window
    p = 8192
    table = rng.standard_normal((p, 3)).astype(np.float32)
    # high-density monotone ids: ~4 ids per output
    rows = np.sort(rng.integers(0, p, size=(2, 2048)), axis=1)
    win, slope = bg.banded_geometry(p, 2048)
    assert win > 2048 and slope > 2.0
    seg, st, offs, op, oi, ok = bg.plan_banded_gather_rows_robust(
        rows, window=win, slope=slope)
    assert ok
    monkeypatch.setattr(bg, "_SMEM_PREFETCH_MAX_BYTES", 64)  # force chunks
    import jax.numpy as jnp

    packed = bg.pack_table(jnp.asarray(table), window=win, slope=slope)
    out = bg._banded_gather_call(
        packed, jnp.asarray(seg.reshape(-1)), jnp.asarray(st.reshape(-1)),
        jnp.asarray(offs.reshape(-1, offs.shape[-1])),
        window=win, slope=slope, interpret=True)
    got = np.asarray(out[:, :3, :]).transpose(0, 2, 1).reshape(2, -1, 3)
    ref = bg.banded_gather_xla(
        jnp.asarray(table), jnp.asarray(st.reshape(-1)),
        jnp.asarray(offs.reshape(-1, offs.shape[-1])))
    np.testing.assert_allclose(
        got, np.asarray(ref).reshape(2, -1, 3), atol=0, rtol=0)

    # K-window variant through the same chunked path
    seg2, st2, offs2, op2, oi2, ok2 = bg.plan_banded_gather_rows_multi(
        rows, n_windows=2, window=win, slope=slope)
    assert ok2
    out2 = bg.banded_gather_multi(
        packed, jnp.asarray(seg2.reshape(-1, 2)),
        jnp.asarray(st2.reshape(-1, 2)),
        jnp.asarray(offs2.reshape(-1, offs2.shape[-1])),
        window=win, slope=slope, interpret=True)
    ref2 = bg.banded_gather_xla_multi(
        jnp.asarray(table), jnp.asarray(st2.reshape(-1, 2)),
        jnp.asarray(offs2.reshape(-1, offs2.shape[-1])), window=win)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=0, rtol=0)
