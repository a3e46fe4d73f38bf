"""Window-warp (Pallas/XLA stencil) parity vs the gather grid-sample
implementation, forward and adjoint (reference semantics:
utils/flow_utils.py:5-16 torch grid_sample bicubic/zeros/align_corners)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tclight_tpu.ops.flow import warp_flow
from tclight_tpu.ops.warp_kernel import (
    warp_flow_window,
    window_warp_pallas,
    window_warp_xla,
)


@pytest.fixture
def small(rng):
    frames = jnp.asarray(rng.uniform(size=(2, 24, 40, 3)).astype(np.float32))
    flows = jnp.asarray(
        rng.uniform(-2.5, 2.5, size=(2, 24, 40, 2)).astype(np.float32)
    )
    return frames, flows


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
def test_window_xla_fwd_matches_gather(small, mode):
    frames, flows = small
    ref = np.asarray(warp_flow(frames, flows, mode=mode))
    got = np.asarray(window_warp_xla(frames, flows, 3, mode=mode))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["bicubic", "bilinear"])
def test_window_pallas_interpret_fwd(small, mode):
    frames, flows = small
    ref = np.asarray(warp_flow(frames, flows, mode=mode))
    got = np.asarray(
        window_warp_pallas(frames, flows, 3, mode=mode, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.slow
def test_adjoint_matches_gather_grad(small):
    frames, flows = small
    tgt = frames[::-1]

    def loss_ref(f):
        return jnp.sum((warp_flow(f, flows) - tgt) ** 2)

    def loss_win(f):
        return jnp.sum((warp_flow_window(f, flows, 3, "bicubic", "xla") - tgt) ** 2)

    g_ref = np.asarray(jax.grad(loss_ref)(frames))
    g_win = np.asarray(jax.grad(loss_win)(frames))
    np.testing.assert_allclose(g_win, g_ref, atol=1e-4)


def test_adjoint_pallas_interpret(small):
    frames, flows = small
    tgt = frames[::-1]
    g_ref = np.asarray(
        jax.grad(lambda f: jnp.sum((warp_flow(f, flows) - tgt) ** 2))(frames)
    )
    g_pal = np.asarray(
        jax.grad(
            lambda f: jnp.sum(
                (warp_flow_window(f, flows, 3, "bicubic", "pallas", True) - tgt)
                ** 2
            )
        )(frames)
    )
    np.testing.assert_allclose(g_pal, g_ref, atol=1e-4)


def test_zero_flow_is_identity(rng):
    frames = jnp.asarray(rng.uniform(size=(1, 16, 32, 3)).astype(np.float32))
    flows = jnp.zeros((1, 16, 32, 2), jnp.float32)
    got = np.asarray(window_warp_xla(frames, flows, 4))
    np.testing.assert_allclose(got, np.asarray(frames), atol=1e-6)


def test_flow_grads_are_zero(small):
    """warp_flow_window treats flows as constants (documented contract)."""
    frames, flows = small
    g = jax.grad(
        lambda fl: jnp.sum(warp_flow_window(frames, fl, 3, "bicubic", "xla"))
    )(flows)
    np.testing.assert_allclose(np.asarray(g), 0.0)
