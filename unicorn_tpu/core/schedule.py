"""LR schedules (reference unicorn/utils/lr_scheduler.py), as jax-friendly
pure functions of the iteration index (usable inside jitted train steps via
optax.inject_hyperparams or computed host-side per step).
"""
from __future__ import annotations

import jax.numpy as jnp


def yolox_warm_cos_lr(
    lr: float,
    min_lr_ratio: float,
    total_iters: int,
    warmup_total_iters: int,
    warmup_lr_start: float,
    no_aug_iter: int,
    iters,
):
    """Quadratic warmup -> cosine -> no-aug floor (lr_scheduler.py:121-148)."""
    iters = jnp.asarray(iters, jnp.float32)
    min_lr = lr * min_lr_ratio
    warm = (lr - warmup_lr_start) * (iters / max(warmup_total_iters, 1)) ** 2 + warmup_lr_start
    cos = min_lr + 0.5 * (lr - min_lr) * (
        1.0 + jnp.cos(
            jnp.pi * (iters - warmup_total_iters)
            / max(total_iters - warmup_total_iters - no_aug_iter, 1)
        )
    )
    out = jnp.where(iters <= warmup_total_iters, warm, cos)
    return jnp.where(iters >= total_iters - no_aug_iter, min_lr, out)


def warm_cos_lr(lr, total_iters, warmup_total_iters, warmup_lr_start, iters):
    """Linear warmup -> cosine (lr_scheduler.py:96-118)."""
    iters = jnp.asarray(iters, jnp.float32)
    warm = (lr - warmup_lr_start) * iters / max(warmup_total_iters, 1) + warmup_lr_start
    cos = lr * 0.5 * (
        1.0 + jnp.cos(
            jnp.pi * (iters - warmup_total_iters)
            / max(total_iters - warmup_total_iters, 1)
        )
    )
    return jnp.where(iters <= warmup_total_iters, warm, cos)


def multistep_lr(lr, milestones, gamma, iters):
    """Step decay (lr_scheduler.py:190-205)."""
    iters = jnp.asarray(iters, jnp.float32)
    out = jnp.asarray(lr, jnp.float32)
    for m in milestones:
        out = jnp.where(iters >= m, out * gamma, out)
    return out


def ema_decay_schedule(base_decay: float, updates):
    """Exponentially-ramped EMA decay (utils/ema.py:46):
    d(t) = base * (1 - exp(-t / 2000))."""
    updates = jnp.asarray(updates, jnp.float32)
    return base_decay * (1.0 - jnp.exp(-updates / 2000.0))
