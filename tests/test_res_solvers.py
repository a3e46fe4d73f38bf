"""RES solver family parity vs the reference runge_kutta/multi_step
modules (imported from /root/reference as oracles)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from _ref_oracle import ref_import

from tclight_tpu.cosmos.edm import (
    MULTISTEP_SOLVERS, RK_SOLVERS, SolverConfig, rho_timesteps, sample_res)


def _x0_fn_np(x, s):
    # analytically smooth pseudo-denoiser: shrink toward tanh(x)
    return np.tanh(x) * 0.9


def _x0_fn_jax(x, s):
    return jnp.tanh(x) * 0.9


def _x0_fn_torch(x, s):
    import torch

    return torch.tanh(x) * 0.9


@pytest.mark.parametrize("name", sorted(RK_SOLVERS))
def test_rk_steps_match_reference(name, rng):
    import torch
    get_runge_kutta_fn = ref_import(
        "cosmos1.models.diffusion.diffusion.functional.runge_kutta"
    ).get_runge_kutta_fn

    x = rng.normal(size=(2, 4, 4)).astype(np.float32) * 5.0
    s, t = 2.0, 1.2
    ones = torch.ones(2, dtype=torch.float64)
    ref_fn = get_runge_kutta_fn(name)
    x_ref, x0_ref = ref_fn(torch.from_numpy(x).double(), s * ones, t * ones,
                           _x0_fn_torch)
    ours_fn = RK_SOLVERS[name]
    x_ours, x0_ours = ours_fn(jnp.asarray(x), jnp.asarray(s), jnp.asarray(t),
                              _x0_fn_jax)
    np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(), atol=2e-4,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(x0_ours), x0_ref.numpy(),
                               atol=2e-4, rtol=1e-4)


def test_multistep_2ab_matches_reference(rng):
    import torch
    get_multi_step_fn = ref_import(
        "cosmos1.models.diffusion.diffusion.functional.multi_step"
    ).get_multi_step_fn

    ref_fn = get_multi_step_fn("2ab")
    ours = MULTISTEP_SOLVERS["2ab"]
    x = rng.normal(size=(2, 3, 3)).astype(np.float32) * 3.0
    ones = torch.ones(2, dtype=torch.float64)

    # first step (no history)
    x0 = _x0_fn_np(x, None)
    x_ref, hist = ref_fn(torch.from_numpy(x).double(), 2.0 * ones, 1.5 * ones,
                         torch.from_numpy(x0).double(), [])
    prev0 = (jnp.zeros_like(jnp.asarray(x)), jnp.asarray(1.0),
             jnp.asarray(False))
    x_ours, prev = ours(jnp.asarray(x), jnp.asarray(2.0), jnp.asarray(1.5),
                        jnp.asarray(x0), prev0)
    np.testing.assert_allclose(np.asarray(x_ours), x_ref.numpy(), atol=2e-4)

    # second step (with history)
    x2_np = np.asarray(x_ours)
    x0_2 = _x0_fn_np(x2_np, None)
    x_ref2, _ = ref_fn(torch.from_numpy(x2_np).double(), 1.5 * ones,
                       1.0 * ones, torch.from_numpy(x0_2).double(), hist)
    x_ours2, _ = ours(jnp.asarray(x2_np), jnp.asarray(1.5), jnp.asarray(1.0),
                      jnp.asarray(x0_2), prev)
    np.testing.assert_allclose(np.asarray(x_ours2), x_ref2.numpy(), atol=2e-4,
                               rtol=1e-4)


def test_sample_res_runs_all_solvers(rng):
    noise = jnp.asarray(rng.normal(size=(1, 8, 8)).astype(np.float32))
    sigmas = rho_timesteps(n=6)[:-1]
    x_init = noise * sigmas[0]
    for name in sorted(RK_SOLVERS):
        out = sample_res(_x0_fn_jax, x_init, sigmas,
                         SolverConfig(rk=name))
        assert np.isfinite(np.asarray(out)).all(), name
    out = sample_res(_x0_fn_jax, x_init, sigmas, SolverConfig(is_multi=True))
    assert np.isfinite(np.asarray(out)).all()
    # stochastic churn requires a key and stays finite
    out = sample_res(_x0_fn_jax, x_init, sigmas,
                     SolverConfig(s_churn=2.0), key=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out)).all()
    with pytest.raises(ValueError):
        sample_res(_x0_fn_jax, x_init, sigmas, SolverConfig(s_churn=1.0))
