"""LR schedule: linear warmup then cosine decay (reference train.py:21-27).

warmup 2000 steps 3e-6 -> 3e-4, then cosine from 3e-4 down to 3e-6 over
the remaining steps; scaled by world_size/4 like the reference launch
(train.py:66).
"""
from __future__ import annotations

import jax.numpy as jnp


def warmup_cosine_schedule(total_steps: int, *, peak: float = 3e-4, floor: float = 3e-6,
                           warmup_steps: int = 2000, world_scale: float = 1.0):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / warmup_steps * peak
        progress = (step - warmup_steps) / (total_steps - warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        mul = jnp.cos(progress * jnp.pi) * 0.5 + 0.5
        cos = (peak - floor) * mul + floor
        return jnp.where(step < warmup_steps, warm, cos) * world_scale

    return schedule
