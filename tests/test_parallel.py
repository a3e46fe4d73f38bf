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
