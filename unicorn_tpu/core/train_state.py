"""Train state: params + optimizer + EMA, as a flax struct pytree.

Replaces the reference's Trainer-held model/optimizer/EMA objects
(unicorn/core/trainer.py:292-368, utils/ema.py). The whole state shards
under pjit; EMA update happens inside the jitted train step.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .schedule import ema_decay_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    ema_base_decay: float = struct.field(pytree_node=False, default=0.9998)

    @classmethod
    def create(cls, params, tx, ema_base_decay: float = 0.9998, use_ema: bool = True):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if use_ema else None,
            tx=tx,
            ema_base_decay=ema_base_decay,
        )

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_step = self.step + 1
        if self.ema_params is not None:
            d = ema_decay_schedule(self.ema_base_decay, new_step)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e * d + (1.0 - d) * p, self.ema_params, new_params
            )
        else:
            new_ema = None
        return self.replace(
            step=new_step, params=new_params, opt_state=new_opt_state,
            ema_params=new_ema,
        )


def make_optimizer(
    lr_fn: Callable,
    kind: str = "adamw",
    weight_decay: float = 1e-4,
    momentum: float = 0.9,
    grad_accum: int = 1,
    max_grad_norm: Optional[float] = None,
    no_decay_mask_fn: Optional[Callable] = None,
):
    """AdamW for the uni stage (exp/unicorn_track.py:373-385), SGD+nesterov for
    det pretraining (exp/unicorn_det.py). lr_fn maps step -> lr.

    Weight decay is masked off norm/bias params when a mask fn is given
    (reference splits pg0/pg1/pg2 param groups).
    """
    if grad_accum > 1:
        # optax.MultiSteps advances the inner optimizer (and its schedule
        # count) once per grad_accum micro-steps, but the exps size
        # total_iters/warmup_total_iters in ITERATION units — the reference
        # updates the lr every iteration regardless of accumulation
        # (trainer.py:221 update_lr(progress_in_iter + 1)). Rescale the count
        # back to iteration units or the whole schedule stretches by
        # grad_accum x (warmup twice as long, cosine never completing).
        inner_lr_fn = lr_fn
        lr_fn = lambda count: inner_lr_fn(count * grad_accum)  # noqa: E731
    if kind == "adamw":
        opt = optax.adamw(
            learning_rate=lr_fn, weight_decay=weight_decay,
            mask=no_decay_mask_fn,
        )
    elif kind == "sgd":
        opt = optax.chain(
            optax.add_decayed_weights(weight_decay, mask=no_decay_mask_fn),
            optax.sgd(learning_rate=lr_fn, momentum=momentum, nesterov=True),
        )
    else:
        raise ValueError(kind)
    parts = []
    if max_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(opt)
    tx = optax.chain(*parts) if len(parts) > 1 else opt
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


def rewind_opt_counts(opt_state, opt_step: int):
    """Set every optimizer step counter (adam `count`, schedule `count`,
    MultiSteps `gradient_step`) to `opt_step` and any MultiSteps `mini_step`
    to 0.

    Used when resuming a mid-epoch preemption checkpoint: the trainer replays
    that epoch from iter 0, so counters saved mid-epoch would run the LR
    schedule up to one epoch ahead of the actual iteration count by the time
    the replayed epoch ends."""
    def fix(path, leaf):
        name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
        if name in ("count", "gradient_step"):
            return jnp.asarray(opt_step, leaf.dtype)
        if name == "mini_step":
            return jnp.zeros_like(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(fix, opt_state)


def default_wd_mask(params):
    """True where weight decay applies: 2D+ kernels only (not bias/scale/norm).

    Mirrors the reference's param-group split (exp/unicorn_det.py pg0/pg1/pg2).
    """
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)
