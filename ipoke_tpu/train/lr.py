"""LR schedules (reference: utils/general.py:221-228 linear_var; wiring in
second_stage_video.py:49-54,148-152,238-253)."""
from __future__ import annotations

import jax.numpy as jnp


def linear_var(it, start_it, end_it, start_val, end_val, clip_min, clip_max):
    act_it = jnp.clip(it, start_it, end_it)
    denom = max(end_it - start_it, 1)
    return jnp.clip(
        start_val + (end_val - start_val) * (act_it - start_it) / denom, clip_min, clip_max
    )


def second_stage_schedule(lr, warmup_steps, total_steps, lr_scaling=True, custom_decrease=True):
    """0 -> lr over warmup_steps, then linear decay lr -> 0 over the rest."""

    def schedule(step):
        warm = linear_var(step, 0, warmup_steps, 0.0, lr, 0.0, lr)
        decay = linear_var(step, warmup_steps, total_steps, lr, 0.0, 0.0, lr)
        if lr_scaling and custom_decrease:
            return jnp.where(step < warmup_steps, warm, decay)
        if lr_scaling:
            return warm
        if custom_decrease:
            return decay
        return jnp.asarray(lr, jnp.float32)

    return schedule
