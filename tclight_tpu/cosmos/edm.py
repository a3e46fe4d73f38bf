"""EDM diffusion core: sigma scaling, rho-spaced timesteps, and samplers
(Euler / Heun-RK2 / 2nd-order multistep).

Rebuild of cosmos1/models/diffusion/diffusion/: `EDMScaling`
(denoiser_scaling.py), `get_rev_ts` rho-spaced timesteps (res_sampler.py:70),
Runge-Kutta solvers (functional/runge_kutta.py), AB2 multistep
(functional/multi_step.py), and the `Sampler` driver (res_sampler.py:107-283)
— as pure jittable functions with `lax.scan` sampling loops.

Model contract: `x0_fn(x, sigma) -> x0 prediction` (the CFG-combined
x0 function of model_t2w.py:42-281).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["EDMScaling", "rho_timesteps", "sample_edm"]


@dataclasses.dataclass(frozen=True)
class EDMScaling:
    """c_skip/c_out/c_in/c_noise coefficients (Karras et al. 2022)."""

    sigma_data: float = 0.5

    def __call__(self, sigma: jnp.ndarray):
        sd2 = self.sigma_data**2
        c_skip = sd2 / (sigma**2 + sd2)
        c_out = sigma * self.sigma_data / jnp.sqrt(sigma**2 + sd2)
        c_in = 1.0 / jnp.sqrt(sigma**2 + sd2)
        c_noise = 0.25 * jnp.log(sigma)
        return c_skip, c_out, c_in, c_noise


def rho_timesteps(sigma_max: float = 80.0, sigma_min: float = 0.002,
                  n: int = 35, rho: float = 7.0) -> np.ndarray:
    """Descending rho-spaced sigma ladder with terminal 0 (get_rev_ts)."""
    ramp = np.linspace(0, 1, n)
    sig = (sigma_max ** (1 / rho) + ramp * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def _euler_step(x0_fn, x, s_cur, s_next):
    x0 = x0_fn(x, s_cur)
    d = (x - x0) / s_cur
    return x + d * (s_next - s_cur), x0


def sample_edm(
    x0_fn: Callable,
    noise: jnp.ndarray,
    sigmas: np.ndarray | None = None,
    solver: str = "heun",       # 'euler' | 'heun' | 'multistep'
) -> jnp.ndarray:
    """Deterministic EDM sampling from pure noise (`noise` ~ N(0, I)).

    'heun' = 2nd-order Runge-Kutta with Euler final step (the reference's
    RK2 sampler); 'multistep' = 2nd-order Adams-Bashforth over the x0
    trajectory (multi_step.py)."""
    if sigmas is None:
        sigmas = rho_timesteps()
    sigmas = jnp.asarray(sigmas)
    x = noise * sigmas[0]
    n = len(sigmas) - 1

    if solver == "euler":
        def body(carry, i):
            x, = carry
            x, _ = _euler_step(x0_fn, x, sigmas[i], sigmas[i + 1])
            return (x,), None

        (x,), _ = jax.lax.scan(body, (x,), jnp.arange(n))
        return x

    if solver == "heun":
        def body(carry, i):
            x, = carry
            s_cur, s_next = sigmas[i], sigmas[i + 1]
            x0 = x0_fn(x, s_cur)
            d = (x - x0) / s_cur
            x_eul = x + d * (s_next - s_cur)

            def correct(x_eul):
                x0_2 = x0_fn(x_eul, s_next)
                d2 = (x_eul - x0_2) / s_next
                return x + 0.5 * (d + d2) * (s_next - s_cur)

            x = jax.lax.cond(s_next > 0, correct, lambda _: x_eul, x_eul)
            return (x,), None

        (x,), _ = jax.lax.scan(body, (x,), jnp.arange(n))
        return x

    if solver == "multistep":
        def body(carry, i):
            x, x0_prev, has_prev = carry
            s_cur, s_next = sigmas[i], sigmas[i + 1]
            x0 = x0_fn(x, s_cur)
            # AB2 over x0: extrapolate with the previous prediction
            r = (s_next - s_cur) / jnp.maximum(s_cur, 1e-8)
            d = (x - x0) / s_cur
            x_first = x + d * (s_next - s_cur)
            d_prev = (x - x0_prev) / s_cur
            x_second = x + (1.5 * d - 0.5 * d_prev) * (s_next - s_cur)
            x = jnp.where(has_prev, x_second, x_first)
            return (x, x0, jnp.asarray(True)), None

        (x, _, _), _ = jax.lax.scan(
            body, (x, jnp.zeros_like(x), jnp.asarray(False)), jnp.arange(n)
        )
        return x

    raise ValueError(solver)
