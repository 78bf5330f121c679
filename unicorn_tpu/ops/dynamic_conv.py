"""CondInst dynamic-convolution mask head as batched matmuls, TPU-native.

Reference: unicorn/models/condinst/dynamic_mask_head.py:61-285. The per-
instance grouped 1x1 convs become einsums over a fixed instance axis N (pad +
validity mask; the MXU sees (N, HW, C) x (N, C, C') batched matmuls instead
of group-conv). Param vector layout matches the reference exactly
(weights [80, 64, 8] then biases [8, 8, 1], weight blocks row-major
(out, in)), so converted checkpoints produce identical masks.

Also: aligned_bilinear (condinst/comm.py:5-27), compute_locations
(comm.py:30-43), RAFT convex upsampling (dynamic_mask_head.py:159-170).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MASK_CHANNELS = 8
WEIGHT_NUMS = ((MASK_CHANNELS + 2) * MASK_CHANNELS,  # 80: (8 feat + 2 coord) -> 8
               MASK_CHANNELS * MASK_CHANNELS,        # 64
               MASK_CHANNELS * 1)                    # 8
BIAS_NUMS = (MASK_CHANNELS, MASK_CHANNELS, 1)
NUM_GEN_PARAMS = sum(WEIGHT_NUMS) + sum(BIAS_NUMS)   # 169
SIZES_OF_INTEREST = (64, 128, 256, 512, 1024)


def parse_dynamic_params(params):
    """params (N, 169) -> ([w0 (N,10,8), w1 (N,8,8), w2 (N,8,1)],
    [b0 (N,8), b1 (N,8), b2 (N,1)]). Weight blocks are stored (out, in)
    row-major in the reference; we transpose to (in, out) for x @ w."""
    n = params.shape[0]
    splits = []
    off = 0
    for sz in WEIGHT_NUMS + BIAS_NUMS:
        splits.append(params[:, off: off + sz])
        off += sz
    in_chs = (MASK_CHANNELS + 2, MASK_CHANNELS, MASK_CHANNELS)
    out_chs = (MASK_CHANNELS, MASK_CHANNELS, 1)
    weights = [
        splits[i].reshape(n, out_chs[i], in_chs[i]).transpose(0, 2, 1)
        for i in range(3)
    ]
    biases = [splits[3 + i].reshape(n, out_chs[i]) for i in range(3)]
    return weights, biases


def compute_locations(h: int, w: int, stride: int):
    """(h*w, 2) pixel-center locations (comm.py:30-43)."""
    xs = jnp.arange(w, dtype=jnp.float32) * stride + stride // 2
    ys = jnp.arange(h, dtype=jnp.float32) * stride + stride // 2
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)


def dynamic_mask_logits(mask_feats, params, instance_locations,
                        instance_fpn_levels, mask_feat_stride: int = 8):
    """Run the 3-layer dynamic head for N instances at once.

    mask_feats: (H, W, C=8); params: (N, 169);
    instance_locations: (N, 2) image coords; instance_fpn_levels: (N,) int.
    Returns logits (N, H, W).
    """
    H, W, C = mask_feats.shape
    N = params.shape[0]
    locations = compute_locations(H, W, mask_feat_stride)  # (HW, 2)
    rel = (instance_locations[:, None, :] - locations[None, :, :])  # (N, HW, 2)
    soi = jnp.asarray(SIZES_OF_INTEREST, jnp.float32)[
        jnp.clip(instance_fpn_levels, 0, len(SIZES_OF_INTEREST) - 1)]
    rel = rel / soi[:, None, None]
    feat = jnp.broadcast_to(
        mask_feats.reshape(1, H * W, C), (N, H * W, C)
    ).astype(jnp.float32)
    x = jnp.concatenate([rel.astype(jnp.float32), feat], axis=-1)  # (N, HW, 10)

    weights, biases = parse_dynamic_params(params.astype(jnp.float32))
    for i, (w, b) in enumerate(zip(weights, biases)):
        x = jnp.einsum("nhc,nco->nho", x, w) + b[:, None, :]
        if i < 2:
            x = jax.nn.relu(x)
    return x.reshape(N, H, W)


def resize_align_corners(x, out_h: int, out_w: int):
    """Bilinear resize with align_corners=True, NHWC or (N, H, W)."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    ys = jnp.linspace(0.0, h - 1.0, out_h)
    xs = jnp.linspace(0.0, w - 1.0, out_w)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (ys - y0)[None, :, None, None]
    lx = (xs - x0)[None, None, :, None]
    v00 = x[:, y0][:, :, x0]
    v01 = x[:, y0][:, :, x1]
    v10 = x[:, y1][:, :, x0]
    v11 = x[:, y1][:, :, x1]
    out = (v00 * (1 - ly) * (1 - lx) + v01 * (1 - ly) * lx
           + v10 * ly * (1 - lx) + v11 * ly * lx)
    return out[..., 0] if squeeze else out


def aligned_bilinear(x, factor: int):
    """Replicate-pad + align_corners upsample + shift-crop (comm.py:5-27).

    x: (N, H, W) or (N, H, W, C). Returns factor-upsampled tensor with the
    same alignment as the reference.
    """
    if factor == 1:
        return x
    squeeze = x.ndim == 3
    if squeeze:
        x = x[..., None]
    n, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)), mode="edge")
    oh, ow = factor * h + 1, factor * w + 1
    x = resize_align_corners(x, oh, ow)
    pad = factor // 2
    x = jnp.pad(x, ((0, 0), (pad, 0), (pad, 0), (0, 0)), mode="edge")
    x = x[:, : oh - 1, : ow - 1]
    return x[..., 0] if squeeze else x


def convex_upsample(pred, up_mask, up_rate: int = 8):
    """RAFT-style convex-combination upsampling
    (dynamic_mask_head.py:159-170).

    pred: (N, H, W) logits; up_mask: (H, W, 9*up_rate**2) from the mask
    branch. Returns (N, up_rate*H, up_rate*W).
    """
    N, H, W = pred.shape
    R = up_rate
    m = up_mask.reshape(H, W, 9, R, R).transpose(2, 3, 4, 0, 1)  # (9, R, R, H, W)
    m = jax.nn.softmax(m, axis=0)
    # 3x3 neighborhoods of pred (zero-padded, matching F.unfold)
    p = jnp.pad(pred, ((0, 0), (1, 1), (1, 1)))
    patches = jnp.stack(
        [p[:, dy: dy + H, dx: dx + W] for dy in range(3) for dx in range(3)],
        axis=1,
    )  # (N, 9, H, W)
    up = jnp.einsum("nkhw,krshw->nrshw", patches, m)  # (N, R, R, H, W)
    up = up.transpose(0, 3, 1, 4, 2)  # (N, H, R, W, R)
    return up.reshape(N, H * R, W * R)
