"""Sampler correctness: convergence with an oracle denoiser + schedule
shape/spacing invariants."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.diffusion.schedulers import (
    DDIMScheduler,
    DPMSolverMultistepScheduler,
    NoiseSchedule,
    karras_sigmas,
)


def test_karras_sigma_spacing():
    s = karras_sigmas(0.03, 14.6, 25)
    assert s[0] == pytest.approx(14.6, rel=1e-6)
    assert s[-1] == pytest.approx(0.03, rel=1e-6)
    assert (np.diff(s) < 0).all()


def test_schedule_matches_sd_constants():
    sched = NoiseSchedule()
    ac = sched.alphas_cumprod()
    assert ac.shape == (1000,)
    # SD1.5 well-known endpoints
    assert ac[0] == pytest.approx(1 - 0.00085, rel=1e-5)
    assert 0.0045 < ac[-1] < 0.0049


def test_dpm_timesteps_monotone_descending():
    sched = DPMSolverMultistepScheduler(num_inference_steps=25)
    ts = sched.timesteps()
    assert ts.shape == (25,)
    assert (np.diff(ts) < 0).all()
    assert ts[0] > 950 and ts[-1] < 25
    sig = sched.sigmas()
    assert sig.shape == (26,) and sig[-1] == 0.0


def _oracle_eps(x, sigma, x0_true):
    """Exact epsilon for a known clean image under VP: x = a x0 + s eps."""
    alpha = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    s = sigma * alpha
    return (x - alpha * x0_true) / jnp.maximum(s, 1e-8)


@pytest.mark.parametrize("algo", ["dpmsolver++", "sde-dpmsolver++"])
def test_dpm_solver_recovers_x0_with_oracle(algo):
    """With a perfect denoiser, 25 solver steps must recover x0 almost
    exactly (SDE noise injections cancel at sigma -> 0)."""
    sched = DPMSolverMultistepScheduler(num_inference_steps=25, algorithm_type=algo)
    x0_true = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (1, 8, 8, 4)).astype(np.float32)
    )
    sigmas = jnp.asarray(sched.sigmas())
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, x0_true.shape) * sched.init_noise_sigma
    state = sched.init_state(x)
    for i in range(25):
        key, sub = jax.random.split(key)
        eps = _oracle_eps(x, sigmas[i], x0_true)
        state, x = sched.step(state, eps, x, sub)
    err = float(jnp.abs(x - x0_true).max())
    assert err < 5e-3, err


def test_ddim_roundtrip_inversion():
    """DDIM invert then sample with an x0-consistent oracle returns the
    original latent."""
    sched = DDIMScheduler(num_inference_steps=20)
    x0_true = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (1, 6, 6, 4)).astype(np.float32)
    )
    ac = jnp.asarray(sched.alphas_cumprod(), jnp.float32)
    ts = sched.timesteps()

    def oracle(x, t):
        a = ac[t]
        return (x - jnp.sqrt(a) * x0_true) / jnp.sqrt(1 - a)

    # forward sampling from pure x0: noise-free oracle keeps x on the ODE
    x = x0_true
    for idx in reversed(range(len(ts))):  # low t -> high t (inversion)
        x = sched.step(oracle(x, ts[idx]), idx, x, inversion=True)
    x_noisy = x
    for idx in range(len(ts)):  # high t -> low t (sampling)
        x = sched.step(oracle(x, ts[idx]), idx, x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0_true), atol=1e-4)
    assert float(jnp.abs(x_noisy - x0_true).max()) > 0.1  # inversion did noise


def test_dpm_scan_compatible():
    """The whole 25-step loop rolls into one lax.scan."""
    sched = DPMSolverMultistepScheduler(num_inference_steps=25)
    x0_true = jnp.zeros((1, 4, 4, 4))
    sigmas = jnp.asarray(sched.sigmas())
    keys = jax.random.split(jax.random.PRNGKey(0), 25)

    @jax.jit
    def run(x):
        state = sched.init_state(x)

        def body(carry, inp):
            state, x = carry
            i, key = inp
            eps = _oracle_eps(x, sigmas[i], x0_true)
            state, x = sched.step(state, eps, x, key)
            return (state, x), None

        (state, x), _ = jax.lax.scan(
            body, (state, x), (jnp.arange(25), keys)
        )
        return x

    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 4))
    out = run(x)
    assert float(jnp.abs(out - x0_true).max()) < 5e-3
