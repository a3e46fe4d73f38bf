"""Post-optimization stages on synthetic videos with known structure."""

import numpy as np
import pytest
import jax.numpy as jnp

from tclight_tpu.pipeline.chunks import make_chunk_plan, make_step_plans, n_chunk_slots
from tclight_tpu.pipeline.postopt import (
    PostOptConfig,
    init_palette,
    render_palette,
    run_exposure_align,
    run_uvt,
)


def small_cfg(**kw):
    base = dict(
        epochs_exposure=8, epochs=12, batch_size=4,
        ms_ssim_levels=2,  # small test images
    )
    base.update(kw)
    return PostOptConfig(**base)


def _static_video(n=6, h=48, w=48):
    """Static scene + per-frame global brightness flicker."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
    gains = np.linspace(0.7, 1.3, n).astype(np.float32)
    frames = np.stack([np.clip(base * g, 0, 1) for g in gains])
    flows = np.zeros((n, h, w, 2), np.float32)
    masks = np.ones((n, h, w), np.float32)
    return frames, flows, masks, base


def test_chunk_plan_properties():
    rng = np.random.default_rng(0)
    for _ in range(20):
        plan = make_chunk_plan(30, 4, rng)
        ids = plan.indices[plan.valid]
        assert sorted(ids.tolist()) == list(range(30))
        assert plan.n_slots == n_chunk_slots(30, 4)
        # padded entries repeat the last valid frame of the slot
        for s in range(plan.n_slots):
            v = plan.valid[s]
            if v.any() and not v.all():
                last = plan.indices[s][v][-1]
                assert (plan.indices[s][~v] == last).all()


def test_chunk_plans_stacked():
    idx, valid = make_step_plans(25, 30, 4, seed=1)
    assert idx.shape == (25, n_chunk_slots(30, 4), 4)
    assert valid.shape == idx.shape
    # every step covers every frame exactly once
    for t in range(25):
        assert sorted(idx[t][valid[t]].tolist()) == list(range(30))


@pytest.mark.slow
def test_exposure_align_reduces_flicker():
    frames, flows, masks, base = _static_video()
    cfg = small_cfg(epochs_exposure=20, lambda_flow=0.9)
    aligned, exposure, losses, _times = run_exposure_align(
        jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks), cfg, seed=0
    )
    aligned = np.asarray(aligned)
    # temporal variance of the static scene should drop substantially
    var_before = frames.std(axis=0).mean()
    var_after = aligned.std(axis=0).mean()
    assert var_after < var_before * 0.55, (var_before, var_after)
    assert losses.shape[0] == 20 * 2  # 6 frames / bs 4 -> 2 batches/epoch
    assert losses[-1] < losses[0]


def test_palette_init_and_render_roundtrip():
    # 2 frames, all pixels of a frame in one track each
    frames = np.stack([
        np.full((4, 4, 3), 0.25, np.float32),
        np.full((4, 4, 3), 0.75, np.float32),
    ])
    unq_inv = np.concatenate([np.zeros(16, np.int32), np.ones(16, np.int32)])
    feats = init_palette(jnp.asarray(frames), jnp.asarray(unq_inv), 2, pad_to=128)
    out = np.asarray(render_palette(feats, jnp.asarray(unq_inv), (2, 4, 4, 3)))
    np.testing.assert_allclose(out, frames, atol=1e-5)


@pytest.mark.slow
def test_uvt_static_video_converges_to_shared_palette():
    frames, flows, masks, base = _static_video(n=4)
    n, h, w, _ = frames.shape
    # ground-truth tracks: static video -> every pixel is one track across time
    unq_inv = np.tile(np.arange(h * w, dtype=np.int32), n)
    cfg = small_cfg(epochs=15, lambda_flow=0.5, lambda_tv=0.0)
    out, losses, _times = run_uvt(
        jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks),
        unq_inv, h * w, cfg, seed=0,
    )
    out = np.asarray(out)
    # all frames forced to one palette: temporal std ~ 0
    assert out.std(axis=0).max() < 1e-4
    # and the shared value stays near the temporal mean of the input
    np.testing.assert_allclose(out[0], frames.mean(axis=0), atol=0.08)


def test_uvt_zero_epochs_noop():
    frames, flows, masks, _ = _static_video(n=2)
    cfg = small_cfg(epochs=0)
    out, losses, _times = run_uvt(
        jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks),
        np.zeros(frames.size // 3, np.int32), 1, cfg,
    )
    np.testing.assert_allclose(np.asarray(out), frames)
    assert losses.size == 0


def test_palette_gather_adjoint_exact_with_collisions():
    """The gather-based palette adjoint must match the autodiff scatter
    VJP, including frames where track ids collide (duplicate ids within a
    frame), and must preserve exact zeros (Adam eps=1e-15 turns sign noise
    on near-zero gradients into full-size steps)."""
    import jax
    import jax.numpy as jnp

    from tclight_tpu.pipeline import postopt

    rng = np.random.default_rng(3)
    b, hw, p_pad = 4, 700, 256
    inv = rng.integers(0, 200, (b, hw)).astype(np.int32)  # many collisions
    inv_map, op, oi = postopt.palette_pixel_index(inv, p_pad)
    feats = jnp.asarray(rng.standard_normal((p_pad, 3)).astype(np.float32))
    g = rng.standard_normal((b, hw, 3)).astype(np.float32)
    g[:, 100:200] = 0.0  # a zero band: adjoint rows touched only by zeros
    g = jnp.asarray(g)

    ref = jax.vjp(lambda f: f[jnp.asarray(inv)], feats)[1](g)[0]
    got = jax.vjp(
        lambda f: postopt._palette_gather(
            f, jnp.asarray(inv), jnp.asarray(inv_map),
            jnp.asarray(op), jnp.asarray(oi)),
        feats)[1](g)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # exact zero preservation
    assert np.array_equal(np.asarray(ref) == 0, np.asarray(got) == 0)


@pytest.mark.slow
def test_uvt_sorted_fallback_path(monkeypatch):
    """Force the memory-bounded sorted-CSR adjoint (used when the dense
    (N, P) inverse map would not fit) and check it converges the same."""
    from tclight_tpu.pipeline import postopt

    monkeypatch.setattr(postopt, "_DENSE_MAP_MAX_BYTES", 0)
    frames, flows, masks, base = _static_video(n=4)
    n, h, w, _ = frames.shape
    unq_inv = np.tile(np.arange(h * w, dtype=np.int32), n)
    cfg = small_cfg(epochs=15, lambda_flow=0.5, lambda_tv=0.0)
    out, losses, _times = run_uvt(
        jnp.asarray(frames), jnp.asarray(flows), jnp.asarray(masks),
        unq_inv, h * w, cfg, seed=0,
    )
    out = np.asarray(out)
    assert out.std(axis=0).max() < 1e-4
    np.testing.assert_allclose(out[0], frames.mean(axis=0), atol=0.08)


def test_build_uvt_tables_respects_compute_platform_override():
    """The driver's multichip dryrun can run a virtual-CPU mesh inside a
    process whose default backend is the tunneled TPU (entry() initializes
    the TPU client first). The planner must follow set_compute_platform,
    not jax.default_backend(), or the banded Pallas plans get lowered
    non-interpret on CPU devices and fail."""
    import numpy as np

    from tclight_tpu.pipeline.postopt import (_banded_interpret,
                                              build_uvt_tables)
    from tclight_tpu.utils.device import set_compute_platform

    b, h, w, p_pad = 2, 16, 16, 256
    unq_inv = np.tile(np.arange(h * w, dtype=np.int32), b)
    set_compute_platform("tpu")  # simulate: default backend says tpu
    try:
        assert _banded_interpret() is False
        tables, _ = build_uvt_tables(unq_inv, b, h, w, p_pad)
        assert len(tables) == 10  # banded plans chosen for the TPU target
        set_compute_platform("cpu")  # dryrun pins the mesh platform
        assert _banded_interpret() is True
        tables, _ = build_uvt_tables(unq_inv, b, h, w, p_pad)
        assert len(tables) < 10  # never banded Pallas for a CPU target
    finally:
        set_compute_platform(None)
