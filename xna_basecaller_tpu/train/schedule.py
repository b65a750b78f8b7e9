"""Learning-rate schedules (reference: ub-bonito/bonito/schedule.py).

Expressed as plain step->lr callables consumable by optax.  The default is
linear warmup (from 10% of peak over 500 steps) followed by cosine decay to
``end_ratio`` of peak — reference linear_warmup_cosine_decay + func_scheduler
(schedule.py:7-17, 110-120).
"""

from __future__ import annotations

import math


def const_schedule(y):
    return lambda t: y


def linear_schedule(y0, y1):
    return lambda t: y0 + (y1 - y0) * t


def cosine_decay_schedule(y0, y1):
    return lambda t: y1 + 0.5 * (y0 - y1) * (math.cos(t * math.pi) + 1.0)


def inverse_sqrt_decay_schedule(scale):
    return lambda t: 1.0 / math.sqrt(1 + scale * t)


def piecewise_schedule(knots, funcs):
    """Piecewise combinator over normalised time t in [0, 1]
    (reference schedule.py:94-103)."""
    def f(t):
        i = 0
        while i < len(knots) and t > knots[i]:
            i += 1
        t0 = 0.0 if i == 0 else knots[i - 1]
        t1 = 1.0 if i == len(knots) else knots[i]
        return funcs[i]((t - t0) / (t1 - t0))
    return f


def linear_warmup_cosine_decay(lr: float, total_steps: int,
                               warmup_steps: int = 500,
                               end_ratio: float = 0.01,
                               warmup_ratio: float = 0.1,
                               start_step: int = 0):
    """step -> lr, jnp-traceable (optax calls it under jit).

    ``start_step`` offsets for resume, mirroring the reference's
    last_epoch*steps offset (training.py:193-197).
    """
    import jax.numpy as jnp

    total = max(total_steps, 1)
    tw = min(max(warmup_steps, 1) / total, 1.0)

    def schedule(step):
        t = jnp.minimum((step + start_step) / total, 1.0)
        warm = warmup_ratio + (1.0 - warmup_ratio) * (t / tw)
        tc = jnp.clip((t - tw) / max(1.0 - tw, 1e-9), 0.0, 1.0)
        cos = end_ratio + 0.5 * (1.0 - end_ratio) * (
            jnp.cos(tc * math.pi) + 1.0)
        return lr * jnp.where(t <= tw, warm, cos)

    return schedule
