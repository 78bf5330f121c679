"""Label-map helpers (reference unicorn/utils/merge.py): one-hot conversion
and label-map resizing used by the VOS drivers."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def convert_to_onehot(x, axis: int):
    """Hard one-hot along `axis` (merge.py:18-23)."""
    idx = jnp.argmax(x, axis=axis, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    return (iota == idx).astype(x.dtype)


def adjust_labels_sz(lbs, dh: int, dw: int):
    """(F, K, H, W) label maps -> bilinear resize to (dh, dw) + one-hot over
    K (merge.py:25-33)."""
    x = jax.image.resize(lbs, lbs.shape[:2] + (dh, dw), "bilinear")
    return convert_to_onehot(x, axis=1)
