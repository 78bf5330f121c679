"""Pixel-correspondence correlation + label propagation, TPU-native.

The reference computes a dense (N, N) similarity matrix (N = H/8 * W/8, up to
16k x 16k at 800x1280 => ~1 GB fp32) then a column-softmax and a bmm
(unicorn/models/unicorn.py:319-327, external/lib/test/tracker/unicorn_sot.py:94-100).

Here the propagation is a flash-attention-shaped streaming computation over
column chunks: for each target pixel j,
    out[k, j] = sum_i lbs0[k, i] * softmax_i(e0_i . e1_j)
so the N x N matrix never materializes. Differentiable (jax rematerializes
per chunk under grad). A Pallas kernel can replace the inner block later.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def correlation_propagate(embed0, embed1, lbs0, chunk: int = 1024):
    """Propagate frame-0 label maps to frame 1 through embedding correlation.

    Args:
      embed0: (B, N, C) frame-0 embeddings (keys/source).
      embed1: (B, N, C) frame-1 embeddings (queries/target).
      lbs0:   (B, K, N) frame-0 label maps (values).
      chunk:  column-chunk size (static).

    Returns: (B, K, N) propagated labels.
    """
    B, N, C = embed1.shape
    K = lbs0.shape[1]
    pad = (-N) % chunk
    if pad:
        embed1 = jnp.pad(embed1, ((0, 0), (0, pad), (0, 0)))
    n_chunks = embed1.shape[1] // chunk
    e1_chunks = embed1.reshape(B, n_chunks, chunk, C).transpose(1, 0, 2, 3)

    def body(carry, e1_c):
        # e1_c: (B, chunk, C); sim: (B, N, chunk)
        sim = jnp.einsum("bnc,bmc->bnm", embed0, e1_c,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(sim, axis=1)  # over source pixels i
        out_c = jnp.einsum("bkn,bnm->bkm", lbs0, att)  # (B, K, chunk)
        return carry, out_c

    _, outs = jax.lax.scan(body, None, e1_chunks)
    out = outs.transpose(1, 2, 0, 3).reshape(B, K, n_chunks * chunk)
    return out[:, :, :N]


def correlation_propagate_dense(embed0, embed1, lbs0):
    """Dense oracle (materializes (B, N, N)); for tests on small shapes."""
    sim = jnp.einsum("bnc,bmc->bnm", embed0, embed1,
                     preferred_element_type=jnp.float32)
    att = jax.nn.softmax(sim, axis=1)
    return jnp.einsum("bkn,bnm->bkm", lbs0, att)


def box_label_map(boxes_cxcywh, H: int, W: int):
    """Rasterize boxes as binary maps, vectorized (unicorn.py:521-534).

    boxes_cxcywh: (B, 4) in image coords. Returns (B, H, W) float32.
    Matches the reference's integer-rounded box edges.
    """
    x1 = jnp.round(boxes_cxcywh[:, 0] - 0.5 * boxes_cxcywh[:, 2]).astype(jnp.int32)
    y1 = jnp.round(boxes_cxcywh[:, 1] - 0.5 * boxes_cxcywh[:, 3]).astype(jnp.int32)
    x2 = jnp.round(boxes_cxcywh[:, 0] + 0.5 * boxes_cxcywh[:, 2]).astype(jnp.int32)
    y2 = jnp.round(boxes_cxcywh[:, 1] + 0.5 * boxes_cxcywh[:, 3]).astype(jnp.int32)
    x1 = jnp.maximum(x1, 0)
    y1 = jnp.maximum(y1, 0)
    xs = jnp.arange(W)[None, None, :]
    ys = jnp.arange(H)[None, :, None]
    inside = (
        (xs >= x1[:, None, None]) & (xs < x2[:, None, None])
        & (ys >= y1[:, None, None]) & (ys < y2[:, None, None])
    )
    return inside.astype(jnp.float32)


def resize_bilinear_torch(x, out_h: int, out_w: int):
    """Bilinear resize matching torch F.interpolate(align_corners=False),
    i.e. half-pixel sampling WITHOUT anti-aliasing (relevant for downsampling
    the label maps by 2/4/8: unicorn.py:325-331)."""
    return jax.image.resize(
        x, x.shape[:-3] + (out_h, out_w, x.shape[-1]), method="bilinear",
        antialias=False,
    )


def dice_loss(pred, gt, sample_mask=None):
    """Dice loss over (possibly masked) flattened maps (unicorn.py:512-519).

    pred/gt: (B, ...) broadcast-compatible; sample_mask: optional (B,) weights.
    With a mask this equals the reference's dice computed on the sub-batch.
    """
    eps = 1e-5
    axes = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * gt, axis=axes)
    union = jnp.sum(pred ** 2, axis=axes) + jnp.sum(gt ** 2, axis=axes)
    if sample_mask is None:
        return 1.0 - 2.0 * jnp.sum(inter) / (jnp.sum(union) + eps)
    inter = jnp.sum(inter * sample_mask)
    union = jnp.sum(union * sample_mask)
    return 1.0 - 2.0 * inter / (union + eps)


def grid_sample_at_points(feat, points_xy):
    """Bilinear-sample feature map at (sub-)pixel points, border padding.

    feat: (H, W, C); points_xy: (P, 2) pixel coords (align_corners=False style
    already applied by the caller). Mirrors F.grid_sample(padding_mode='border')
    used to pull instance embeddings at box centers (unicorn.py:437-448).
    """
    H, W, C = feat.shape
    x = jnp.clip(points_xy[:, 0], 0.0, W - 1.0)
    y = jnp.clip(points_xy[:, 1], 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    lx = (x - x0)[:, None]
    ly = (y - y0)[:, None]
    v00 = feat[y0, x0]
    v01 = feat[y0, x1]
    v10 = feat[y1, x0]
    v11 = feat[y1, x1]
    return (
        v00 * (1 - lx) * (1 - ly) + v01 * lx * (1 - ly)
        + v10 * (1 - lx) * ly + v11 * lx * ly
    )
