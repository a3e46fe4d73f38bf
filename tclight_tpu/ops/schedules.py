"""Learning-rate schedules.

`expon_lr_schedule` rebuilds the Plenoxels/JaxNeRF log-lerp decay with delay
used by the exposure-alignment stage (utils/general_utils.py:31-64;
configured at generate.py:381-388), as an optax-compatible schedule: a
function step -> lr usable with `optax.scale_by_schedule` /
`optax.inject_hyperparams`.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["expon_lr_schedule"]


def expon_lr_schedule(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear interpolation from lr_init (step 0) to lr_final
    (step max_steps), optionally eased in over `lr_delay_steps`."""

    if lr_init == 0.0 and lr_final == 0.0:
        return lambda step: jnp.zeros_like(jnp.asarray(step, jnp.float32))

    log_init = jnp.log(lr_init)
    log_final = jnp.log(lr_final)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        log_lerp = jnp.exp(log_init * (1 - t) + log_final * t)
        lr = delay_rate * log_lerp
        return jnp.where(step < 0, 0.0, lr)

    return schedule
