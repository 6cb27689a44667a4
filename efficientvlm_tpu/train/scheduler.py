"""Linear warmup -> linear decay schedule (reference scheduler.py:4-28).

warmup may be a step count (int) or a fraction of total steps (float < 1).
Returned callable maps step -> lr, usable directly as an optax schedule.
"""

from __future__ import annotations

import jax.numpy as jnp


def create_scheduler(*, lr: float, num_training_steps: int, num_warmup_steps: float | int = 0):
    if isinstance(num_warmup_steps, float) and num_warmup_steps < 1:
        warmup = int(num_warmup_steps * num_training_steps)
    else:
        warmup = int(num_warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / jnp.maximum(1.0, warmup)
        decay = (num_training_steps - step) / jnp.maximum(
            1.0, num_training_steps - warmup
        )
        frac = jnp.where(step < warmup, warm, decay)
        return lr * jnp.clip(frac, 0.0, 1.0)

    return schedule
