import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.models.memflow import (
    InferenceCore,
    MemFlowConfig,
    MemFlowNet,
    forward_interpolate,
    init_memory,
)


def test_forward_interpolate_constant_flow():
    flow = np.full((6, 8, 2), 0.0, np.float32)
    flow[..., 0] = 2.0
    out = forward_interpolate(flow)
    # interior columns receive the splatted constant flow
    assert np.allclose(out[:, 2:, 0], 2.0)
    # vacated columns (no source maps there) are zero-filled
    assert np.allclose(out[:, :2], 0.0)


@pytest.mark.slow
def test_memflow_step_and_memory(rng):
    cfg = MemFlowConfig.tiny()
    model = MemFlowNet(cfg)
    a = jnp.asarray(rng.uniform(size=(1, 16, 24, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 16, 24, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), a, b, iters=2)
    mem0 = init_memory(cfg, 1, 2, 3)
    flow_up, flow8, mem1 = model.apply(params, a, b, mem0, iters=2)
    assert flow_up.shape == (1, 16, 24, 2)
    assert flow8.shape == (1, 2, 3, 2)
    assert int(mem1.count) == 1
    # memory bank actually written
    assert float(jnp.abs(mem1.keys).sum()) > 0
    # second step consumes memory, ring advances
    _, _, mem2 = model.apply(params, a, b, mem1, iters=2)
    assert int(mem2.count) == 2


@pytest.mark.slow
def test_inference_core_streaming(rng):
    cfg = MemFlowConfig.tiny()
    model = MemFlowNet(cfg)
    frames = rng.uniform(size=(3, 16, 24, 3)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(frames[:1]), jnp.asarray(frames[1:2]),
        iters=2,
    )
    core = InferenceCore(model, params)
    f1 = core.step(frames[0], frames[1])
    f2 = core.step(frames[1], frames[2])
    assert f1.shape == (16, 24, 2) and f2.shape == (16, 24, 2)
    assert int(core.memory.count) == 2
    core.reset()
    assert core.memory is None


@pytest.mark.slow
def test_memory_ring_wraps(rng):
    cfg = MemFlowConfig.tiny()  # capacity 4
    model = MemFlowNet(cfg)
    a = jnp.asarray(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), a, a, iters=1)
    mem = init_memory(cfg, 1, 2, 2)
    for _ in range(6):
        _, _, mem = model.apply(params, a, a, mem, iters=1)
    assert int(mem.count) == 6
    assert mem.keys.shape[1] == 4  # bounded capacity
