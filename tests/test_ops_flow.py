"""Flow machinery on synthetic videos with analytically-known flow."""

import numpy as np
import jax.numpy as jnp

from tclight_tpu.ops.flow import (
    compute_fwdbwd_mask,
    get_flowid,
    get_mask_bwds,
    get_soft_mask_bwds,
    voxelization,
    warp_flow,
)


def make_translating_square(n=4, h=16, w=16, dx=1, dy=0):
    """Video of a bright square translating by (dx, dy)/frame + exact flows."""
    frames = np.zeros((n, h, w, 3), np.float32)
    for t in range(n):
        y0, x0 = 4 + t * dy, 4 + t * dx
        frames[t, y0 : y0 + 5, x0 : x0 + 5] = 1.0
    fwd = np.zeros((n, h, w, 2), np.float32)
    fwd[..., 0] = dx
    fwd[..., 1] = dy
    bwd = -fwd
    return frames, fwd, bwd


def test_warp_flow_shifts_back():
    frames, fwd, bwd = make_translating_square()
    # backward-warping frame t-1 by frame t's past flow reconstructs frame t
    warped = np.asarray(warp_flow(jnp.asarray(frames[:-1]), jnp.asarray(bwd[1:])))
    np.testing.assert_allclose(warped, frames[1:], atol=1e-4)


def test_fwdbwd_mask_consistent_flow():
    _, fwd, bwd = make_translating_square()
    fwd_mask, bwd_mask = compute_fwdbwd_mask(jnp.asarray(fwd), jnp.asarray(bwd))
    # perfectly consistent flow -> valid everywhere except image borders,
    # where the warp samples outside (zero padding) and consistency breaks
    assert np.asarray(fwd_mask)[:, 2:-2, 2:-2].all()
    assert np.asarray(bwd_mask)[:, 2:-2, 2:-2].all()


def test_fwdbwd_mask_inconsistent_flow():
    _, fwd, bwd = make_translating_square(dx=3)
    bad_bwd = bwd.copy()
    bad_bwd[..., 0] = +5.0  # wrong direction
    fwd_mask, _ = compute_fwdbwd_mask(jnp.asarray(fwd), jnp.asarray(bad_bwd))
    assert not np.asarray(fwd_mask).any()


def test_hard_and_soft_masks():
    frames, fwd, bwd = make_translating_square()
    hard = np.asarray(
        get_mask_bwds(jnp.asarray(frames), jnp.asarray(fwd), jnp.asarray(bwd))
    )
    assert hard.shape == frames.shape[:3]
    assert hard[0].all()
    # fully consistent video: interior valid (borders invalidated by the
    # zero-padded warp, then grown by the 5x5 erosion)
    assert hard[1:, 4:-4, 4:-4].all()
    soft = np.asarray(
        get_soft_mask_bwds(jnp.asarray(frames), jnp.asarray(fwd), jnp.asarray(bwd))
    )
    assert soft.shape == frames.shape[:3]
    assert np.all(soft[0] == 1.0)
    assert np.all(soft[1:, 4:-4, 4:-4] > 0.9)


def test_get_flowid_static_video():
    # zero flow, constant frames: every pixel keeps its frame-0 id
    h, w = 6, 7
    frames = np.ones((3, h, w, 3), np.float32) * 0.5
    flows = np.zeros((3, h, w, 2), np.float32)
    masks = np.ones((3, h, w), np.float32)
    ids = np.asarray(get_flowid(jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks)))
    base = np.arange(h * w, dtype=np.int32).reshape(h, w)
    for t in range(3):
        np.testing.assert_array_equal(ids[t], base)


def test_get_flowid_translation_tracks():
    frames, fwd, bwd = make_translating_square(n=3, dx=2)
    masks = np.ones(frames.shape[:3], np.float32)
    ids = np.asarray(
        get_flowid(jnp.asarray(frames), jnp.asarray(fwd), jnp.asarray(masks))
    )
    # interior of the square: id propagates along the translation
    # square at t=0 occupies [4:9, 4:9]; at t=1 [4:9, 6:11]
    assert ids[1, 6, 8] == ids[0, 6, 6]
    # pixels no source maps to (left two columns under dx=2) get fresh ids
    h, w = frames.shape[1:3]
    assert ids[1, 6, 0] >= h * w and ids[1, 6, 1] >= h * w


def test_get_flowid_rgb_cutoff():
    # flow says "no motion" but colors change drastically -> tracks cut
    h, w = 5, 5
    frames = np.zeros((2, h, w, 3), np.float32)
    frames[1] = 1.0
    flows = np.zeros((2, h, w, 2), np.float32)
    masks = np.ones((2, h, w), np.float32)
    ids = np.asarray(get_flowid(jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks)))
    assert (ids[1] >= h * w).all()  # all fresh ids


def test_voxelization_time_only():
    ids = np.array([5, 3, 5, 9, 3, 3])
    inv = voxelization(ids)
    # same id -> same palette slot; order-preserving over sorted unique
    assert inv[0] == inv[2]
    assert inv[1] == inv[4] == inv[5]
    assert len(set(inv.tolist())) == 3
    assert inv.max() == 2


def test_voxelization_spatial():
    ids = np.arange(8)
    rgb = np.zeros((8, 3), np.float32)
    coord = np.zeros((8, 3), np.float32)
    coord[4:, 0] = 10.0  # two spatial clusters
    inv = voxelization(ids, rgb, coord, voxel_size=1.0)
    assert len(set(inv.tolist())) == 2
    assert (inv[:4] == inv[0]).all() and (inv[4:] == inv[4]).all()


def test_soft_mask_chunked_matches_full():
    frames, fwd, bwd = make_translating_square(n=7)
    from tclight_tpu.ops.flow import get_soft_mask_bwds_chunked

    full = np.asarray(
        get_soft_mask_bwds(jnp.asarray(frames), jnp.asarray(fwd), jnp.asarray(bwd))
    )
    chunked = get_soft_mask_bwds_chunked(frames, fwd, bwd, chunk=3)
    np.testing.assert_allclose(chunked, full, atol=1e-5)
