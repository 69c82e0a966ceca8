"""Learning-rate schedules.

Parity target: reference `utils/general_utils.py:29-62` (Plenoxels/JaxNeRF
log-linear decay with an optional sine warm-delay). The returned callable is
traceable, so it can drive optax `inject_hyperparams` under jit as well as
host-side loops.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def expon_lr_func(
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1000000,
):
    def helper(step):
        if lr_init == 0.0 and lr_final == 0.0:
            # Disabled parameter group.
            return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * math.pi * jnp.clip(step / lr_delay_steps, 0, 1)
            )
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(math.log(lr_init) * (1 - t) + math.log(lr_final) * t)
        return jnp.where(step < 0, 0.0, delay_rate * log_lerp)

    return helper
