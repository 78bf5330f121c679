"""Model analysis: parameter counts + FLOPs via jax cost analysis.

Reference: unicorn/utils/model_utils.py:19-28 (thop-based get_model_info).
jax gives exact compiled-graph FLOPs from XLA's cost analysis — better than
thop's per-module estimate.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def get_model_info(forward_fn, params, input_shape) -> str:
    """forward_fn(params, imgs); input_shape e.g. (1, 800, 1280, 3)."""
    n_params = count_params(params)
    dummy = jnp.zeros(input_shape, jnp.float32)
    try:
        lowered = jax.jit(forward_fn).lower(params, dummy)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        flops = float("nan")
    return (f"Params: {n_params / 1e6:.2f}M, "
            f"GFLOPs: {flops / 1e9:.2f} @ {input_shape[1]}x{input_shape[2]}")


def fuse_conv_norm(params):
    """Placeholder for conv+norm folding: with GroupNorm (per-sample) there
    is no running-stat folding as with BN (reference fuse_model,
    model_utils.py:60-106); XLA already fuses the affine into the conv
    epilogue at compile time, so this is a no-op by design."""
    return params
