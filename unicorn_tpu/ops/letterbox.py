"""On-device letterbox preprocessing.

The streaming driver uploads raw uint8 frames (3 bytes/px) and does the
scale-preserving resize + 114-pad on chip — 4x less host->device traffic
than uploading preprocessed float32, and the resize rides the VPU
(reference does this on CPU per frame, unicorn/data/data_augment.py:194-215).

cv2.INTER_LINEAR == half-pixel bilinear without anti-aliasing ==
jax.image.resize(method="bilinear", antialias=False) up to uint8 rounding.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("src_hw", "dst_hw"))
def letterbox_device(frame_u8, src_hw, dst_hw):
    """frame_u8: (H_src, W_src, 3) uint8 on device. Returns (H_dst, W_dst, 3)
    float32 letterboxed (top-left content, 114 padding) and the scale r."""
    sh, sw = src_hw
    dh, dw = dst_hw
    r = min(dh / sh, dw / sw)
    rh, rw = int(sh * r), int(sw * r)
    resized = jax.image.resize(
        frame_u8.astype(jnp.float32), (rh, rw, 3), method="bilinear",
        antialias=False,
    )
    out = jnp.full((dh, dw, 3), 114.0, jnp.float32)
    out = jax.lax.dynamic_update_slice(out, resized, (0, 0, 0))
    return out, r


def letterbox_batch_device(frames_u8, src_hw, dst_hw):
    """(B, H_src, W_src, 3) uint8 -> (B, H_dst, W_dst, 3) float32."""
    fn = lambda f: letterbox_device(f, src_hw, dst_hw)[0]
    return jax.vmap(fn)(frames_u8)
