"""Warmup-cosine LR schedule (utils/scheduler.py:5-29 parity).

Linear 0->1 over ``warmup_steps``, then cosine 1->0 over the remaining
``t_total - warmup_steps`` steps; ``cycles`` scales the cosine frequency.
The reference steps this **per epoch** (train.py:512), so "step" here is an
epoch index unless the trainer is configured otherwise."""

from __future__ import annotations

import math

import optax


def warmup_cosine_lambda(step: float, warmup_steps: int, t_total: int,
                         cycles: float = 0.5) -> float:
    if step < warmup_steps:
        return float(step) / float(max(1.0, warmup_steps))
    progress = float(step - warmup_steps) / float(max(1, t_total - warmup_steps))
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * cycles * 2.0 * progress)))


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, t_total: int, cycles: float = 0.5
) -> optax.Schedule:
    def schedule(count):
        import jax.numpy as jnp

        warm = count / jnp.maximum(1.0, warmup_steps)
        progress = (count - warmup_steps) / max(1, t_total - warmup_steps)
        cos = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(jnp.pi * cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(count < warmup_steps, warm, cos)

    return schedule
