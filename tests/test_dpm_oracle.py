"""Behavioral-parity oracle for the DPM-Solver++ (SDE, Karras) scheduler.

THE sampler of the pipeline is diffusers'
`DPMSolverMultistepScheduler(algorithm_type="sde-dpmsolver++",
use_karras_sigmas=True)` (reference utils/model_utils.py:71-78; the
reference pins diffusers==0.32.1 in requirements.txt). diffusers is not in
this image, so `DiffusersDPMOracle` below is a standalone numpy
transcription of that version's published update math — set_timesteps
(Karras ladder + final_sigmas_type="zero"), convert_model_output (epsilon
-> x0), first-order and midpoint second-order sde-dpmsolver++ updates,
and the order-selection rules (lower_order_nums warmup, lower_order_final
at the terminal sigma-0 step).

The trajectory test drives BOTH schedulers in lockstep over a full 25-step
run with a deterministic pseudo-model and identical per-step noise, and
asserts elementwise agreement of every prev_sample — pinning the
multistep-history semantics (first step, order-2 steady state, final
first-order step) that convergence tests alone cannot catch.
"""

from __future__ import annotations

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tclight_tpu.diffusion.schedulers import (
    DPMSolverMultistepScheduler, NoiseSchedule)


class DiffusersDPMOracle:
    """Numpy replica of diffusers 0.32.1 DPMSolverMultistepScheduler for
    the TC-Light configuration: solver_order=2, prediction_type='epsilon',
    solver_type='midpoint', lower_order_final=True, euler_at_final=False,
    final_sigmas_type='zero', timestep_spacing='linspace',
    use_karras_sigmas=True (or False), algorithm_type
    'sde-dpmsolver++' (or 'dpmsolver++'). float64 throughout."""

    def __init__(self, num_inference_steps: int,
                 algorithm_type: str = "sde-dpmsolver++",
                 use_karras_sigmas: bool = True,
                 num_train_timesteps: int = 1000,
                 beta_start: float = 0.00085, beta_end: float = 0.012):
        self.algorithm_type = algorithm_type
        self.solver_order = 2
        betas = np.linspace(beta_start**0.5, beta_end**0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
        alphas_cumprod = np.cumprod(1.0 - betas)
        train_sigmas = ((1 - alphas_cumprod) / alphas_cumprod) ** 0.5
        log_sigmas = np.log(train_sigmas)

        if use_karras_sigmas:
            # _convert_to_karras on the flipped (descending) full ladder:
            # sigma_min/max are the train extremes, rho=7
            in_sigmas = np.flip(train_sigmas)
            sigma_min, sigma_max = in_sigmas[-1], in_sigmas[0]
            rho = 7.0
            ramp = np.linspace(0, 1, num_inference_steps)
            min_inv, max_inv = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
            sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
            timesteps = np.array(
                [self._sigma_to_t(s, log_sigmas) for s in sigmas]
            ).round()
        else:
            # timestep_spacing='linspace'
            timesteps = np.linspace(
                0, num_train_timesteps - 1, num_inference_steps + 1
            ).round()[::-1][:-1].copy()
            sigmas = train_sigmas[timesteps.astype(int)]
        # final_sigmas_type='zero'
        self.sigmas = np.concatenate([sigmas, [0.0]])
        self.timesteps = timesteps
        self.model_outputs = [None] * self.solver_order
        self.lower_order_nums = 0
        self.step_index = 0

    @staticmethod
    def _sigma_to_t(sigma, log_sigmas):
        log_sigma = np.log(max(sigma, 1e-10))
        dists = log_sigma - log_sigmas[:, None]
        low_idx = np.cumsum((dists >= 0), axis=0).argmax(axis=0).clip(
            max=log_sigmas.shape[0] - 2
        )
        high_idx = low_idx + 1
        low, high = log_sigmas[low_idx], log_sigmas[high_idx]
        w = np.clip((low - log_sigma) / (low - high), 0, 1)
        return float(((1 - w) * low_idx + w * high_idx)[0])

    @staticmethod
    def _sigma_to_alpha_sigma_t(sigma):
        alpha_t = 1.0 / np.sqrt(sigma**2 + 1.0)
        return alpha_t, sigma * alpha_t

    def _convert_model_output(self, model_output, sample):
        # epsilon -> x0 at the current ladder position (no thresholding)
        sigma = self.sigmas[self.step_index]
        alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma)
        return (sample - sigma_t * model_output) / alpha_t

    def _first_order(self, m0, sample, noise):
        with np.errstate(divide="ignore"):
            sigma_t, sigma_s = (self.sigmas[self.step_index + 1],
                                self.sigmas[self.step_index])
            alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
            alpha_s, sigma_s = self._sigma_to_alpha_sigma_t(sigma_s)
            lambda_t = np.log(alpha_t) - np.log(sigma_t)
            lambda_s = np.log(alpha_s) - np.log(sigma_s)
            h = lambda_t - lambda_s
            if self.algorithm_type == "sde-dpmsolver++":
                return ((sigma_t / sigma_s * np.exp(-h)) * sample
                        + alpha_t * (1 - np.exp(-2.0 * h)) * m0
                        + sigma_t * np.sqrt(1.0 - np.exp(-2.0 * h)) * noise)
            return ((sigma_t / sigma_s) * sample
                    + alpha_t * (1 - np.exp(-h)) * m0)

    def _second_order(self, model_output_list, sample, noise):
        with np.errstate(divide="ignore"):
            sigma_t = self.sigmas[self.step_index + 1]
            sigma_s0 = self.sigmas[self.step_index]
            sigma_s1 = self.sigmas[self.step_index - 1]
            m0, m1 = model_output_list[-1], model_output_list[-2]
            alpha_t, sigma_t = self._sigma_to_alpha_sigma_t(sigma_t)
            alpha_s0, sigma_s0 = self._sigma_to_alpha_sigma_t(sigma_s0)
            alpha_s1, sigma_s1 = self._sigma_to_alpha_sigma_t(sigma_s1)
            lambda_t = np.log(alpha_t) - np.log(sigma_t)
            lambda_s0 = np.log(alpha_s0) - np.log(sigma_s0)
            lambda_s1 = np.log(alpha_s1) - np.log(sigma_s1)
            h, h_0 = lambda_t - lambda_s0, lambda_s0 - lambda_s1
            r0 = h_0 / h
            D0, D1 = m0, (1.0 / r0) * (m0 - m1)
            if self.algorithm_type == "sde-dpmsolver++":
                # solver_type='midpoint'
                return ((sigma_t / sigma_s0 * np.exp(-h)) * sample
                        + alpha_t * (1 - np.exp(-2.0 * h)) * D0
                        + 0.5 * alpha_t * (1 - np.exp(-2.0 * h)) * D1
                        + sigma_t * np.sqrt(1.0 - np.exp(-2.0 * h)) * noise)
            return ((sigma_t / sigma_s0) * sample
                    + alpha_t * (1 - np.exp(-h)) * D0
                    + 0.5 * alpha_t * (1 - np.exp(-h)) * D1)

    def step(self, model_output, sample, noise):
        n = len(self.timesteps)
        # diffusers: lower_order_final = (last step) and (euler_at_final
        # or (lower_order_final and n < 15) or final_sigmas_type == 'zero')
        # -> with final_sigmas_type='zero' the terminal step is always
        # first-order regardless of n
        lower_order_final = self.step_index == n - 1
        m = self._convert_model_output(model_output, sample)
        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = m
        if self.lower_order_nums < 1 or lower_order_final:
            prev = self._first_order(m, sample, noise)
        else:
            prev = self._second_order(self.model_outputs, sample, noise)
        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self.step_index += 1
        return prev


def _pseudo_eps(x, t):
    """Deterministic smooth pseudo-model (numpy, float64)."""
    return np.tanh(x) * 0.8 + 0.1 * np.sin(x * 3.0 + t / 250.0)


@pytest.mark.parametrize("algorithm,n_steps", [
    ("sde-dpmsolver++", 25),   # THE reference configuration
    ("sde-dpmsolver++", 8),    # short run: warmup + terminal adjacency
    ("dpmsolver++", 25),       # deterministic variant
])
def test_full_trajectory_elementwise_parity(algorithm, n_steps, rng):
    sched = DPMSolverMultistepScheduler(
        num_inference_steps=n_steps, algorithm_type=algorithm)
    oracle = DiffusersDPMOracle(n_steps, algorithm_type=algorithm)

    # schedule parity: sigma ladder exact, timesteps exact (both rounded)
    np.testing.assert_allclose(sched.sigmas(), oracle.sigmas, rtol=1e-6,
                               atol=1e-7)
    np.testing.assert_array_equal(sched.timesteps(),
                                  oracle.timesteps.astype(np.float32))

    shape = (2, 4, 4, 3)
    x = rng.normal(size=shape).astype(np.float32)
    state = sched.init_state(jnp.asarray(x))
    ts = sched.timesteps()
    base_key = jax.random.PRNGKey(42)

    for i in range(n_steps):
        eps = _pseudo_eps(x.astype(np.float64), float(ts[i])).astype(
            np.float32)
        key = jax.random.fold_in(base_key, i)
        # identical noise on both sides: the oracle gets the exact draw the
        # repo scheduler makes internally from this key
        noise = np.asarray(
            jax.random.normal(key, shape, dtype=jnp.float32))
        state, x_repo = sched.step(state, jnp.asarray(eps), jnp.asarray(x),
                                   key)
        x_oracle = oracle.step(eps.astype(np.float64),
                               x.astype(np.float64),
                               noise.astype(np.float64))
        np.testing.assert_allclose(
            np.asarray(x_repo), x_oracle, atol=5e-4, rtol=2e-4,
            err_msg=f"step {i}/{n_steps} (sigma {oracle.sigmas[i]:.4f} -> "
                    f"{oracle.sigmas[i + 1]:.4f})")
        x = np.asarray(x_repo)

    assert np.isfinite(x).all()


def test_non_karras_spacing_matches_linspace_rule():
    """use_karras_sigmas=False: diffusers 'linspace' spacing —
    np.linspace(0, 999, n+1).round()[::-1][:-1]."""
    sched = DPMSolverMultistepScheduler(num_inference_steps=25,
                                        use_karras_sigmas=False)
    oracle = DiffusersDPMOracle(25, use_karras_sigmas=False)
    np.testing.assert_allclose(sched.sigmas(), oracle.sigmas, rtol=1e-6)


def test_terminal_step_is_exact_x0():
    """At the final (sigma=0) step the update must return the x0
    prediction exactly (first-order, zero noise coefficient)."""
    sched = DPMSolverMultistepScheduler(num_inference_steps=4)
    x = np.linspace(-1, 1, 12).reshape(3, 4).astype(np.float32)
    eps = np.full_like(x, 0.3)
    state = sched.init_state(jnp.asarray(x))
    # fast-forward to the last step with valid history
    state = state._replace(
        step_index=jnp.asarray(3, jnp.int32),
        prev_x0=jnp.asarray(x * 0.5),
        has_prev=jnp.asarray(True),
    )
    sigma = sched.sigmas()[3]
    alpha = 1.0 / np.sqrt(sigma**2 + 1)
    x0_expected = (x - sigma * alpha * eps) / alpha
    _, out = sched.step(state, jnp.asarray(eps), jnp.asarray(x),
                        jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), x0_expected, atol=1e-5)
