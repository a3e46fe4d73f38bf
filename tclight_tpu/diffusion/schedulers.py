"""Diffusion samplers: DDIM and multistep DPM-Solver++ (SDE variant, Karras
sigmas) as pure functions with explicit state.

Rebuilds the samplers the reference gets from diffusers:
- `DPMSolverMultistepScheduler(algorithm_type="sde-dpmsolver++",
  use_karras_sigmas=True)` built at utils/model_utils.py:71-78 — THE
  TC-Light sampler (25 steps, CFG 2.0);
- DDIM for the inversion path (invert.py ddim_inversion :151 /
  pred_next_x :215) and the VidToMe manual DDIM update
  (generate_utils.py:283-313).

Design: schedules are precomputed numpy (host); `step` is a pure function
`(state, model_output, sample, key) -> (state, prev_sample)` whose state
(multistep history, step index) is a pytree, so the whole sampling loop
rolls into one `lax.scan` (SURVEY §7.1: scheduler state in the scan carry).

Noise schedule: scaled-linear betas (SD: 0.00085 -> 0.012 over 1000 steps),
epsilon prediction.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["NoiseSchedule", "DDIMScheduler", "DPMSolverMultistepScheduler"]


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """VP diffusion schedule: x_t = sqrt(a_bar_t) x0 + sqrt(1-a_bar_t) eps."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"

    def betas(self) -> np.ndarray:
        n = self.num_train_timesteps
        if self.beta_schedule == "scaled_linear":
            return np.linspace(self.beta_start**0.5, self.beta_end**0.5, n) ** 2
        if self.beta_schedule == "linear":
            return np.linspace(self.beta_start, self.beta_end, n)
        raise ValueError(self.beta_schedule)

    def alphas_cumprod(self) -> np.ndarray:
        return np.cumprod(1.0 - self.betas())

    def sigmas(self) -> np.ndarray:
        """Karras-convention sigma(t) = sqrt((1-a_bar)/a_bar)."""
        ac = self.alphas_cumprod()
        return np.sqrt((1 - ac) / ac)


def karras_sigmas(sigma_min: float, sigma_max: float, n: int, rho: float = 7.0) -> np.ndarray:
    """rho-spaced sigma ladder (Karras et al. 2022), descending."""
    ramp = np.linspace(0, 1, n)
    min_inv, max_inv = sigma_min ** (1 / rho), sigma_max ** (1 / rho)
    return (max_inv + ramp * (min_inv - max_inv)) ** rho


def _sigma_to_t(sigma: np.ndarray, log_sigmas: np.ndarray) -> np.ndarray:
    """Continuous timestep for a sigma by log-linear interpolation on the
    train schedule (diffusers' convention for Karras timesteps)."""
    log_sigma = np.log(np.maximum(sigma, 1e-10))
    dists = log_sigma[None, :] - log_sigmas[:, None]  # (T, n)
    low_idx = np.clip(
        (dists >= 0).cumsum(axis=0).argmax(axis=0), 0, log_sigmas.shape[0] - 2
    )
    high_idx = low_idx + 1
    low, high = log_sigmas[low_idx], log_sigmas[high_idx]
    w = np.clip((low - log_sigma) / (low - high), 0, 1)
    return (1 - w) * low_idx + w * high_idx


def _alpha_sigma_from_sigma(sigma):
    alpha_t = 1.0 / jnp.sqrt(sigma**2 + 1.0)
    return alpha_t, sigma * alpha_t


# ---------------------------------------------------------------------- DDIM


@dataclasses.dataclass(frozen=True)
class DDIMScheduler:
    """Deterministic DDIM (eta=0), epsilon prediction, leading-spaced
    timesteps — matches the reference inversion/sampling math
    (invert.py:215-244, generate_utils.py:283-313)."""

    schedule: NoiseSchedule = NoiseSchedule()
    num_inference_steps: int = 50

    def timesteps(self) -> np.ndarray:
        n = self.schedule.num_train_timesteps
        step = n // self.num_inference_steps
        return (np.arange(0, self.num_inference_steps) * step).round()[::-1].astype(np.int64)

    def alphas_cumprod(self) -> np.ndarray:
        return self.schedule.alphas_cumprod()

    def step(self, eps, t_idx, sample, *, inversion: bool = False):
        """One DDIM update. `t_idx`: index into `timesteps()` (traced ok).

        Forward sampling: x_t -> x_{t-step}. Inversion: x_t -> x_{t+step}
        (pass timesteps in reversed order and inversion=True)."""
        ts = jnp.asarray(self.timesteps())
        ac = jnp.asarray(self.alphas_cumprod(), dtype=jnp.float32)
        n_step = self.schedule.num_train_timesteps // self.num_inference_steps
        t = ts[t_idx]
        if inversion:
            t_prev = t - n_step  # timestep we came from (less noisy)
            a_t = jnp.where(t_prev >= 0, ac[jnp.maximum(t_prev, 0)], 1.0)
            a_next = ac[t]
        else:
            t_next = t - n_step
            a_t = ac[t]
            a_next = jnp.where(t_next >= 0, ac[jnp.maximum(t_next, 0)], 1.0)
        x0 = (sample - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
        return jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps

    def add_noise(self, x0, noise, t):
        ac = jnp.asarray(self.alphas_cumprod(), dtype=jnp.float32)
        a = ac[t]
        return jnp.sqrt(a) * x0 + jnp.sqrt(1 - a) * noise


# ----------------------------------------------------- DPM-Solver++ multistep


@dataclasses.dataclass(frozen=True)
class DDIMStateScheduler:
    """DDIM (eta=0) behind the same (init_state, step) protocol as the
    DPM-Solver scheduler, so the Generator's fused step graphs work with
    either. Used by the non-IC-Light SD editing path, whose sampling math
    is the reference's manual DDIM update (generate_utils.py:283-313)."""

    schedule: NoiseSchedule = NoiseSchedule()
    num_inference_steps: int = 50

    def timesteps(self) -> np.ndarray:
        return DDIMScheduler(
            self.schedule, self.num_inference_steps
        ).timesteps().astype(np.float32)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def init_state(self, sample: jnp.ndarray) -> jnp.ndarray:
        return jnp.asarray(0, jnp.int32)

    def step(
        self,
        state: jnp.ndarray,
        eps: jnp.ndarray,
        sample: jnp.ndarray,
        key: jax.Array | None = None,   # unused: deterministic (eta=0)
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        inner = DDIMScheduler(self.schedule, self.num_inference_steps)
        return state + 1, inner.step(eps, state, sample)

    def add_noise(self, x0, noise, t):
        return DDIMScheduler(self.schedule, self.num_inference_steps).add_noise(
            x0, noise, t
        )


class DPMState(NamedTuple):
    """Multistep solver carry: previous x0 prediction + step index."""

    prev_x0: jnp.ndarray       # x0 prediction at the previous step
    has_prev: jnp.ndarray      # bool: is prev_x0 valid
    step_index: jnp.ndarray    # int32


@dataclasses.dataclass(frozen=True)
class DPMSolverMultistepScheduler:
    """Multistep DPM-Solver++ (order 2, midpoint) with optional SDE noise
    injection and Karras sigma spacing — the reference's
    `sde-dpmsolver++ / use_karras_sigmas` configuration
    (utils/model_utils.py:71-78).

    Usage:
        sched = DPMSolverMultistepScheduler(num_inference_steps=25)
        ts = sched.timesteps()            # float timesteps for the UNet
        state = sched.init_state(sample)
        for i in range(25):
            eps = unet(x, ts[i], ...)
            state, x = sched.step(state, eps, x, key_i)
    """

    schedule: NoiseSchedule = NoiseSchedule()
    num_inference_steps: int = 25
    algorithm_type: str = "sde-dpmsolver++"   # or "dpmsolver++"
    use_karras_sigmas: bool = True
    lower_order_final: bool = True
    rho: float = 7.0

    # -- host-side schedule construction
    def _train_sigmas(self) -> np.ndarray:
        return self.schedule.sigmas()

    def sigmas(self) -> np.ndarray:
        """Descending sigma ladder with terminal 0 appended (length n+1)."""
        train_sigmas = self._train_sigmas()
        if self.use_karras_sigmas:
            s = karras_sigmas(
                float(train_sigmas.min()), float(train_sigmas.max()),
                self.num_inference_steps, self.rho,
            )
        else:
            # diffusers 'linspace' spacing: n+1 points, drop the t=0 entry
            idx = np.linspace(
                0, self.schedule.num_train_timesteps - 1,
                self.num_inference_steps + 1,
            ).round().astype(int)[::-1][:-1]
            s = train_sigmas[idx]
        return np.concatenate([s, [0.0]]).astype(np.float32)

    def timesteps(self) -> np.ndarray:
        """Float timesteps fed to the model, matched to `sigmas()[:-1]`.

        Rounded to integers like diffusers 0.32.1's Karras path
        (`set_timesteps`: `timesteps = ...round()`), so the UNet sees the
        exact reference conditioning values."""
        train_sigmas = self._train_sigmas()
        t = _sigma_to_t(self.sigmas()[:-1], np.log(train_sigmas))
        return t.round().astype(np.float32)

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    def init_state(self, sample: jnp.ndarray) -> DPMState:
        return DPMState(
            prev_x0=jnp.zeros_like(sample),
            has_prev=jnp.asarray(False),
            step_index=jnp.asarray(0, jnp.int32),
        )

    def step(
        self,
        state: DPMState,
        eps: jnp.ndarray,
        sample: jnp.ndarray,
        key: jax.Array | None = None,
    ) -> tuple[DPMState, jnp.ndarray]:
        sigmas = jnp.asarray(self.sigmas())
        i = state.step_index
        sigma_s0 = sigmas[i]
        sigma_t = sigmas[i + 1]
        sigma_s1 = sigmas[jnp.maximum(i - 1, 0)]

        # epsilon -> x0 (data prediction, "++" family)
        alpha_s0, sig_s0 = _alpha_sigma_from_sigma(sigma_s0)
        x0 = (sample - sig_s0 * eps) / alpha_s0

        alpha_t, sig_t = _alpha_sigma_from_sigma(sigma_t)
        lam_t = jnp.log(alpha_t) - jnp.log(jnp.maximum(sig_t, 1e-10))
        lam_s0 = jnp.log(alpha_s0) - jnp.log(jnp.maximum(sig_s0, 1e-10))
        alpha_s1, sig_s1 = _alpha_sigma_from_sigma(sigma_s1)
        lam_s1 = jnp.log(alpha_s1) - jnp.log(jnp.maximum(sig_s1, 1e-10))
        h = lam_t - lam_s0
        h_0 = lam_s0 - lam_s1
        r0 = h_0 / jnp.where(h == 0, 1.0, h)

        sde = self.algorithm_type == "sde-dpmsolver++"
        if sde:
            e2h = jnp.exp(-2.0 * h)
            c_sample = (sig_t / jnp.maximum(sig_s0, 1e-10)) * jnp.exp(-h)
            c_d0 = alpha_t * (1.0 - e2h)
            noise_scale = sig_t * jnp.sqrt(jnp.maximum(1.0 - e2h, 0.0))
        else:
            eh = jnp.exp(-h)
            c_sample = sig_t / jnp.maximum(sig_s0, 1e-10)
            c_d0 = alpha_t * (1.0 - eh)
            noise_scale = jnp.asarray(0.0)

        d0 = x0
        d1 = (x0 - state.prev_x0) / jnp.where(r0 == 0, 1.0, r0)

        use_second = state.has_prev
        if self.lower_order_final:
            use_second = use_second & (i < self.num_inference_steps - 1)
        # final step: sigma_t = 0 -> x_t = x0 exactly under both branches
        x_first = c_sample * sample + c_d0 * d0
        x_second = x_first + 0.5 * c_d0 * d1

        prev = jnp.where(use_second, x_second, x_first)
        if sde:
            if key is None:
                raise ValueError("sde-dpmsolver++ requires a PRNG key per step")
            noise = jax.random.normal(key, sample.shape, dtype=sample.dtype)
            prev = prev + noise_scale * noise

        new_state = DPMState(
            prev_x0=x0,
            has_prev=jnp.asarray(True),
            step_index=i + 1,
        )
        return new_state, prev

    def add_noise(self, x0, noise, step_index):
        """Noise a clean sample to the ladder position `step_index`."""
        sigma = jnp.asarray(self.sigmas())[step_index]
        alpha_t, sigma_t = _alpha_sigma_from_sigma(sigma)
        return alpha_t * x0 + sigma_t * noise
