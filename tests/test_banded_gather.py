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


def test_uvt_tables_fall_back_on_heavy_turnover():
    n, h, w = 3, 8, 512
    ids = _roll_ids(n, h, w).copy()
    # half of frame 2 pixels hold far-spread fresh ids: no window covers
    # them, overflow fraction ~17% > the 8% cap -> decline
    ids[2, ::2] = np.arange((ids.shape[1] + 1) // 2) * 4096 + 100_000
    p_pad = max(128, -(-int(ids.max() + 1) // 128) * 128)
    tables, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                    allow_banded=True)
    assert len(tables) in (3, 4)  # dense/sorted fallback, not banded
