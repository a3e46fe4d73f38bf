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
    ids = _roll_ids(2, 16, 256)
    ids[1, 50:60] = -1  # masked entries -> zero rows
    seg, st, offs, ok = bg.plan_banded_gather_rows(ids)
    assert ok
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((ids.max() + 1, 3)),
                        jnp.float32)
    packed = bg.pack_table(table)
    out = bg.banded_gather(packed, jnp.asarray(seg).reshape(-1),
                           jnp.asarray(st).reshape(-1),
                           jnp.asarray(offs).reshape(-1, 512),
                           interpret=jax.default_backend() != "tpu")
    ref = bg.banded_gather_xla(table, jnp.asarray(st).reshape(-1),
                               jnp.asarray(offs).reshape(-1, 512))
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


def test_uvt_banded_tables_activate_and_match_dense(uvt_case):
    n, h, w, ids, p_pad, feats = uvt_case
    tb, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=True)
    td, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                allow_banded=False)
    assert len(tb) == 8 and len(td) == 4
    idx = jnp.asarray([1, 3, 0])
    fb = po.uvt_gather(feats, tb, idx, hw=h * w)
    fd = po.uvt_gather(feats, td, idx, hw=h * w)
    np.testing.assert_array_equal(np.asarray(fb), np.asarray(fd))


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


def test_uvt_tables_fall_back_on_generation_mixing():
    n, h, w = 3, 8, 512
    ids = _roll_ids(n, h, w).copy()
    # high-turnover footage: fresh far-range ids interleaved per block
    ids[2, ::5] = np.arange((ids.shape[1] + 4) // 5) * 4096 + 50_000_000
    p_pad = max(128, -(-int(ids.max() + 1) // 128) * 128)
    tables, _ = po.build_uvt_tables(ids.reshape(-1), n, h, w, p_pad,
                                    allow_banded=True)
    assert len(tables) in (3, 4)  # dense/sorted fallback, not banded
