"""Mesh/sharding layer on the 8-device virtual CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.parallel.mesh import data_sharding, make_mesh, replicate, shard_params
from tclight_tpu.parallel.sharded import (
    build_parallel_denoise_step,
    pad_plans_to_rounds,
)
from tclight_tpu.pipeline.chunks import make_chunk_plan


def test_make_mesh_shapes():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(6, model_parallel=4)


def test_shard_params_rules():
    mesh = make_mesh(8, model_parallel=2)
    params = {
        "dense": {"kernel": jnp.zeros((64, 128)), "bias": jnp.zeros((128,))},
        "small": {"kernel": jnp.zeros((4, 4))},
    }
    sharded = shard_params(params, mesh)
    specs = jax.tree.map(lambda x: x.sharding.spec, sharded)
    assert tuple(specs["dense"]["kernel"]) == (None, "model")
    assert tuple(specs["dense"]["bias"]) == ()       # too small / 1-D
    assert tuple(specs["small"]["kernel"]) == ()


def test_pad_plans_to_rounds():
    rng = np.random.default_rng(0)
    plan = make_chunk_plan(10, 4, rng)
    idx, valid = pad_plans_to_rounds(plan.indices, plan.valid, 4)
    assert idx.shape[1] == 4 and idx.shape[2] == 4
    assert idx.shape[0] * 4 >= plan.indices.shape[0]
    # padded slots are invalid
    n_real = plan.indices.shape[0]
    assert not valid.reshape(-1, 4)[n_real:].any()


@pytest.mark.slow
def test_parallel_denoise_covers_all_frames():
    """Every valid frame receives a noise prediction; padded slots leave
    zeros nowhere (all frames covered by the plan)."""
    from tclight_tpu.models.unet import ToMeSpec, UNet2DCondition, UNetConfig

    mesh = make_mesh(8, model_parallel=1)
    cfg = UNetConfig.tiny(in_channels=4)
    spec = ToMeSpec(n_frames=4, local_ratio=0.5, merge_global=True)
    unet = UNet2DCondition(cfg, tome_spec=spec)
    key = jax.random.PRNGKey(0)
    x8 = jnp.zeros((8, 16, 16, 4))
    ctx0 = jnp.zeros((8, 77, cfg.context_dim))
    params = jax.jit(unet.init)(key, x8, jnp.asarray(1.0), ctx0)

    n = 10
    rng = np.random.default_rng(3)
    plan = make_chunk_plan(n, 4, rng)
    plan_idx, plan_valid = pad_plans_to_rounds(plan.indices, plan.valid, 8)
    rounds, rs = plan_idx.shape[:2]
    randfs = rng.integers(0, 4, size=(rounds, rs)).astype(np.int32)
    flips = rng.random((rounds, rs)) > 0.5

    step = build_parallel_denoise_step(unet, 4, 2.0, mesh)
    x = jax.random.normal(key, (n, 16, 16, 4))
    cc = jnp.zeros((n, 16, 16, 0))  # 4ch UNet: zero-width concat
    uncond = jax.random.normal(key, (1, 77, cfg.context_dim))
    cond = jax.random.normal(key, (1, 77, cfg.context_dim)) * 2.0
    with mesh:
        noises = step(params, x, cc, (uncond, cond), jnp.asarray(5.0),
                      jnp.asarray(plan_idx), jnp.asarray(plan_valid),
                      jnp.asarray(randfs), jnp.asarray(flips))
    noises = np.asarray(noises)
    assert noises.shape == (n, 16, 16, 4)
    assert np.isfinite(noises).all()
    # every frame was predicted (nonzero epsilon almost surely)
    assert (np.abs(noises).reshape(n, -1).max(axis=1) > 1e-6).all()


@pytest.mark.slow
def test_postopt_mesh_matches_single_device(rng):
    """run_exposure_align/run_uvt produce the same result with and without
    a mesh — ONE loss implementation, two execution layouts."""
    from tclight_tpu.pipeline.postopt import (
        PostOptConfig, run_exposure_align, run_uvt)

    n, h, w = 8, 32, 32
    frames = jnp.asarray(rng.uniform(0.2, 0.8, (n, h, w, 3)).astype(np.float32))
    flows = jnp.asarray(rng.normal(0, 0.5, (n, h, w, 2)).astype(np.float32))
    masks = jnp.ones((n, h, w), np.float32)
    cfg = PostOptConfig(epochs_exposure=2, epochs=2, batch_size=4,
                        ms_ssim_levels=2)
    mesh = make_mesh(8, model_parallel=2)

    a1, e1, h1, _ = run_exposure_align(frames, flows, masks, cfg, seed=3)
    a2, e2, h2, _ = run_exposure_align(frames, flows, masks, cfg, seed=3,
                                       mesh=mesh)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), atol=1e-5)

    unq_inv = np.tile(np.arange(h * w, dtype=np.int32), n)
    r1, l1, _ = run_uvt(a1, flows, masks, unq_inv, h * w, cfg, seed=3)
    r2, l2, _ = run_uvt(a2, flows, masks, unq_inv, h * w, cfg, seed=3,
                        mesh=mesh)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-4)


@pytest.mark.slow
def test_generator_mesh_matches_single_device(tmp_path):
    """The SAME run.py pipeline on a 1-device and an 8-device CPU mesh
    yields matching outputs (SPMD partitioning of one graph)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from test_pipeline_e2e import make_config, make_synthetic_video

    from tclight_tpu.config import ConfigDict
    from tclight_tpu.data.dataparsers import VideoDataParser
    from tclight_tpu.pipeline.generator import Generator
    from tclight_tpu.pipeline.iclight import build_tiny_iclight

    vid_dir, _ = make_synthetic_video(tmp_path, n=8)

    def run(n_devices):
        cfg = make_config(tmp_path, vid_dir)
        cfg["post_opt"]["epochs_exposure"] = 1
        cfg["post_opt"]["epochs"] = 1
        if n_devices:
            cfg["parallel"] = {"n_devices": n_devices, "model_parallel": 2}
        models = build_tiny_iclight(seed=0, num_inference_steps=2)
        parser = VideoDataParser(cfg["data"])
        gen = Generator(models, cfg, data_parser=parser)
        out = gen(None, str(tmp_path / f"out_{n_devices}"), list(range(8)))
        return np.asarray(next(iter(out.values())))

    ref = run(0)
    mesh_out = run(8)
    assert ref.shape == mesh_out.shape
    np.testing.assert_allclose(ref, mesh_out, atol=2e-2)
    assert np.abs(ref - mesh_out).mean() < 2e-3


@pytest.mark.slow
def test_cp_dit_forward_matches_single_device():
    """Context-parallel DiT (tokens sharded over 'data') must produce the
    single-device forward exactly (XLA inserts the attention all-gathers;
    the math is unchanged)."""
    from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT
    from tclight_tpu.parallel.sharded import build_cp_dit_forward

    mesh = make_mesh(8, model_parallel=1)
    cfg = DiTConfig.tiny()
    model = GeneralDIT(cfg)
    key = jax.random.PRNGKey(0)
    b, t, h, w = 2, 8, 8, 8  # t divisible by the 8-way 'data' axis
    x = jax.random.normal(key, (b, t, h, w, cfg.in_channels))
    c_noise = jnp.asarray([0.3, 0.7])
    ctx = jax.random.normal(key, (b, 16, cfg.context_dim))
    params = model.init(key, x, c_noise, ctx)

    ref = model.apply(params, x, c_noise, ctx)
    fwd = build_cp_dit_forward(model, mesh)
    with mesh:
        out = fwd(params, x, c_noise, ctx)
    assert len(out.sharding.device_set) == 8
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.slow
def test_cp_edm_denoiser(monkeypatch):
    """make_edm_denoiser(mesh=...) runs the CP forward and matches the
    unsharded denoiser."""
    from tclight_tpu.cosmos.dit import DiTConfig, GeneralDIT, make_edm_denoiser

    mesh = make_mesh(8, model_parallel=1)
    cfg = DiTConfig.tiny()
    model = GeneralDIT(cfg)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 8, 8, 8, cfg.in_channels))
    ctx = jax.random.normal(key, (1, 16, cfg.context_dim))
    params = model.init(key, x, jnp.asarray([0.5]), ctx)

    x0_ref = make_edm_denoiser(model, params, ctx)(x, 1.3)
    with mesh:
        x0_cp = make_edm_denoiser(model, params, ctx, mesh=mesh)(x, 1.3)
    np.testing.assert_allclose(np.asarray(x0_cp), np.asarray(x0_ref),
                               atol=2e-5, rtol=2e-5)
