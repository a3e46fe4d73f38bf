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

__all__ = ["EDMScaling", "rho_timesteps", "sample_edm", "SolverConfig",
           "sample_res", "RK_SOLVERS", "MULTISTEP_SOLVERS"]


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


# ------------------------------------------------- RES solver family
# (res_sampler.py:107-283 + functional/runge_kutta.py + multi_step.py)


def _phi1(t):
    return jnp.expm1(t) / t


def _phi2(t):
    return (_phi1(t) - 1.0) / t


def _reg_x0_euler_step(x_s, s, t, x0_s):
    """x' = (s-t)/s * x0 + t/s * x (reg_x0_euler_step)."""
    return (s - t) / s * x0_s + (t / s) * x_s, x0_s


def _reg_eps_euler_step(x_s, s, t, eps_s):
    return x_s + eps_s * (t - s), x_s + eps_s * (0 - s)


def _res_x0_rk2_step(x_s, t, s, x0_s, s1, x0_s1):
    """Residual exponential-integrator RK2 update (runge_kutta.py:53-95)."""
    ls, lt, lm = -jnp.log(s), -jnp.log(t), -jnp.log(s1)
    dt = lt - ls
    c2 = (lm - ls) / dt
    p1, p2 = _phi1(-dt), _phi2(-dt)
    b1 = jnp.nan_to_num(p1 - p2 / c2)
    b2 = jnp.nan_to_num(p2 / c2)
    return (jnp.exp(-dt) * x_s + dt * (b1 * x0_s + b2 * x0_s1)).astype(x_s.dtype)


def _rk1_euler(x_s, s, t, x0_fn):
    x0_s = x0_fn(x_s, s)
    return _reg_x0_euler_step(x_s, s, t, x0_s)


def _rk2_mid_stable(x_s, s, t, x0_fn):
    s1 = jnp.sqrt(s * t)
    x_s1, _ = _rk1_euler(x_s, s, s1, x0_fn)
    x0_s1 = x0_fn(x_s1, s1)
    return _reg_x0_euler_step(x_s, s, t, x0_s1)


def _rk2_mid(x_s, s, t, x0_fn):
    s1 = jnp.sqrt(s * t)
    x_s1, x0_s = _rk1_euler(x_s, s, s1, x0_fn)
    x0_s1 = x0_fn(x_s1, s1)
    return _res_x0_rk2_step(x_s, t, s, x0_s, s1, x0_s1), x0_s1


def _rk_2heun_naive(x_s, s, t, x0_fn):
    x_t, x0_s = _rk1_euler(x_s, s, t, x0_fn)
    # NB the reference estimates eps at s from x_t (runge_kutta.py:220) —
    # kept verbatim for parity
    eps_s = (x_t - x0_s) / s
    x0_t = x0_fn(x_t, t)
    eps_t = (x_t - x0_t) / t
    return _reg_eps_euler_step(x_s, s, t, (eps_s + eps_t) / 2)


def _rk_2heun_edm(x_s, s, t, x0_fn):
    x_t, x0_s = _rk1_euler(x_s, s, t, x0_fn)
    x0_t = x0_fn(x_t, t)
    return _reg_x0_euler_step(x_s, s, t, (x0_s + x0_t) / 2)


def _rk_3kutta_naive(x_s, s, t, x0_fn):
    c2, c3 = 0.5, 1.0
    a31, a32 = -1.0, 2.0
    b1, b2, b3 = 1.0 / 6, 4.0 / 6, 1.0 / 6
    delta = t - s
    s1 = c2 * delta + s
    s2 = c3 * delta + s
    x_s1, x0_s = _rk1_euler(x_s, s, s1, x0_fn)
    eps_s = (x_s - x0_s) / s
    x0_s1 = x0_fn(x_s1, s1)
    eps_s1 = (x_s1 - x0_s1) / s1
    x_s2, _ = _reg_eps_euler_step(x_s, s, s2, a31 * eps_s + a32 * eps_s1)
    x0_s2 = x0_fn(x_s2, s2)
    eps_s2 = (x_s2 - x0_s2) / s2
    avg_eps = b1 * eps_s + b2 * eps_s1 + b3 * eps_s2
    return _reg_eps_euler_step(x_s, s, t, avg_eps)


RK_SOLVERS = {
    "1euler": _rk1_euler,
    "2mid": _rk2_mid,
    "2mid_stable": _rk2_mid_stable,
    "2heun_edm": _rk_2heun_edm,
    "2heun_naive": _rk_2heun_naive,
    "3kutta_naive": _rk_3kutta_naive,
}


def _multistep_2ab(x_s, s, t, x0_s, prev):
    """AB2 over x0 predictions (multi_step.py order2_fn); `prev` =
    (x0_s1, s1, valid)."""
    x0_s1, s1, has_prev = prev
    x_first, _ = _reg_x0_euler_step(x_s, s, t, x0_s)
    x_second = _res_x0_rk2_step(x_s, t, s, x0_s, s1, x0_s1)
    x_t = jnp.where(has_prev, x_second, x_first)
    return x_t, (x0_s, s, jnp.asarray(True))


MULTISTEP_SOLVERS = {"2ab": _multistep_2ab}


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """res_sampler.py SolverConfig (:38-51)."""

    is_multi: bool = False
    rk: str = "2mid"
    multistep: str = "2ab"
    s_churn: float = 0.0
    s_t_max: float = float("inf")
    s_t_min: float = 0.05
    s_noise: float = 1.0


def sample_res(
    x0_fn: Callable,
    x_sigma_max: jnp.ndarray,
    sigmas: np.ndarray | None = None,
    cfg: SolverConfig = SolverConfig(),
    key: jax.Array | None = None,
    sample_clean: bool = True,
) -> jnp.ndarray:
    """The reference Sampler driver (res_sampler.py:107-190 +
    differential_equation_solver :211-283): RK/multistep steps over a
    rho-spaced sigma ladder, optional EDM stochastic churn, and a final
    clean x0 evaluation. `x_sigma_max` is the noised input at sigmas[0]."""
    if sigmas is None:
        sigmas = rho_timesteps()[:-1]  # RES ladder ends at sigma_min, not 0
    sigmas = jnp.asarray(sigmas, jnp.float32)
    num_step = len(sigmas) - 1
    eta = min(cfg.s_churn / (num_step + 1), float(np.sqrt(1.2) - 1.0))
    use_churn = cfg.s_churn > 0
    if use_churn and key is None:
        raise ValueError("stochastic churn (s_churn > 0) needs a PRNG key")
    if key is None:
        key = jax.random.PRNGKey(0)

    step_rk = RK_SOLVERS[cfg.rk]
    step_ms = MULTISTEP_SOLVERS[cfg.multistep]

    def body(carry, inp):
        x, prev = carry
        i, sub = inp
        s_cur = sigmas[i]
        s_next = sigmas[i + 1]
        if use_churn:
            churn_on = (cfg.s_t_min < s_cur) & (s_cur < cfg.s_t_max)
            s_hat = jnp.where(churn_on, s_cur + eta * s_cur, s_cur)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = x + jnp.sqrt(jnp.maximum(s_hat**2 - s_cur**2, 0.0)) * \
                cfg.s_noise * noise
            s_cur = s_hat
        if cfg.is_multi:
            x0 = x0_fn(x, s_cur)
            x, prev = step_ms(x, s_cur, s_next, x0, prev)
        else:
            x, _ = step_rk(x, s_cur, s_next, x0_fn)
        return (x, prev), None

    prev0 = (jnp.zeros_like(x_sigma_max), jnp.asarray(1.0), jnp.asarray(False))
    keys = jax.random.split(key, num_step)
    (x, _), _ = jax.lax.scan(
        body, (x_sigma_max, prev0), (jnp.arange(num_step), keys))
    if sample_clean:
        # final step to clean (res_sampler.py sample_clean: one more x0 eval)
        x = x0_fn(x, sigmas[-1])
    return x


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
