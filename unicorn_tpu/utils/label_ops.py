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


def read_indexed_mask(path):
    """Read an object-id mask PNG preserving PALETTE INDICES.

    DAVIS / YouTube-VOS annotations are palette-indexed ('P'-mode) PNGs;
    cv2.IMREAD_GRAYSCALE converts the palette to luma — ids {1, 2, 3}
    come back as {38, 75, 113} — corrupting object identities everywhere
    downstream. PIL returns the raw index plane, which is what the
    official DAVIS evaluator reads (davis2017/davis.py: np.atleast_3d(
    Image.open(...))[..., 0]); this mirrors that exactly.
    """
    import numpy as np
    from PIL import Image

    return np.atleast_3d(np.array(Image.open(path)))[..., 0]
