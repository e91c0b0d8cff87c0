"""LR schedule: linear warmup then cosine decay (reference train.py:21-27).

warmup 2000 steps 3e-6 -> 3e-4, then cosine from 3e-4 down to 3e-6 over
the remaining steps; scaled by world_size/4 like the reference launch
(train.py:66).
"""
from __future__ import annotations

import jax.numpy as jnp


def cyclic_lr_schedule(*, base: float = 1e-6, peak: float = 1e-3,
                       step_size_up: int = 8000, world_scale: float = 1.0):
    """Triangular cyclic LR — the legacy v1/v2 presets' scheduler
    (CyclicLR(base_lr=1e-6, max_lr=1e-3, step_size_up=8000),
    model/oldmodel/RIFE_HD.py:139-140 / RIFE_HDv2.py analog): linear
    base->peak over step_size_up steps, back down over the same, repeat.
    """

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        cycle_pos = jnp.mod(step, 2.0 * step_size_up)
        up = cycle_pos / step_size_up          # 0..2 over one cycle
        frac = jnp.where(up <= 1.0, up, 2.0 - up)
        return (base + (peak - base) * frac) * world_scale

    return schedule


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
