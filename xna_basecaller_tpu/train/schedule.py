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


def linear_warmup_const_inverse_sqrt_decay(
        lr: float, total_steps: int, steps_per_epoch: int, epochs: int,
        warmup_steps: int = 1000, decay_start_epoch: int = 10,
        decay_scale: float = 1.0, linear_cooldown_n_epochs: int = 0,
        linear_cooldown_end_ratio: float = 0.0, start_step: int = 0):
    """Warmup -> const -> inverse-sqrt decay -> optional linear cooldown
    (reference schedule.py:20-55), jnp-traceable."""
    import jax.numpy as jnp

    total = max(total_steps, 1)
    t_w = warmup_steps / total
    t_d = decay_start_epoch / max(epochs, 1)
    t_c = (epochs - linear_cooldown_n_epochs) / max(epochs, 1)
    n_decay = max(epochs - decay_start_epoch - linear_cooldown_n_epochs, 0)
    scale = decay_scale * n_decay
    decay_end = 1.0 / math.sqrt(1 + scale)

    def schedule(step):
        t = jnp.minimum((step + start_step) / total, 1.0)
        warm = t / max(t_w, 1e-9)
        dec_t = jnp.clip((t - t_d) / max(t_c - t_d, 1e-9), 0.0, 1.0)
        dec = 1.0 / jnp.sqrt(1 + scale * dec_t)
        cool_t = jnp.clip((t - t_c) / max(1.0 - t_c, 1e-9), 0.0, 1.0)
        cool = decay_end + (linear_cooldown_end_ratio - decay_end) * cool_t
        val = jnp.where(t <= t_w, warm,
                        jnp.where(t <= t_d, 1.0,
                                  jnp.where(t <= t_c, dec, cool)))
        return lr * val

    return schedule


def linear_cooldown_schedule(lr: float, total_steps: int,
                             end_ratio: float = 0.0, start_step: int = 0):
    """Plain linear cooldown (reference schedule.py:58-67)."""
    import jax.numpy as jnp

    total = max(total_steps, 1)

    def schedule(step):
        t = jnp.minimum((step + start_step) / total, 1.0)
        return lr * (1.0 + (end_ratio - 1.0) * t)

    return schedule
