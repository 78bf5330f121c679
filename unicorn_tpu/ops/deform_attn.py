"""Multi-scale deformable attention sampling, TPU-native.

The reference implements this as a CUDA im2col kernel
(unicorn/models/ops/src/cuda/ms_deform_im2col_cuda.cuh) with a pure-PyTorch
grid_sample oracle (unicorn/models/ops/functions/ms_deform_attn_func.py:41-62).
Here the baseline implementation is pure XLA (static-shape gathers + bilinear
weights, differentiable for free via JAX autodiff); a fused Pallas kernel can
swap in underneath without changing the interface.

Semantics match F.grid_sample(mode='bilinear', padding_mode='zeros',
align_corners=False): pixel coordinate x_pix = loc * W - 0.5, out-of-range
corners contribute zero.
"""
from __future__ import annotations

import jax.numpy as jnp


def ms_deform_attn(value, sampling_locations, attention_weights):
    """Deformable attention aggregation over L equal-shape levels.

    Args:
      value: (B, L, H, W, M, D) per-level value maps split into M heads.
      sampling_locations: (B, Lq, M, L, P, 2) normalized (x, y) in [0, 1].
      attention_weights: (B, Lq, M, L, P), already softmaxed over L*P.

    Returns:
      (B, Lq, M * D)
    """
    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = sampling_locations.shape

    # to pixel coords (grid_sample align_corners=False)
    x = sampling_locations[..., 0] * W - 0.5  # (B, Lq, M, L, P)
    y = sampling_locations[..., 1] * H - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    lx = x - x0
    ly = y - y0

    # value laid out for gathering along flattened spatial dim
    # (B, L, M, H*W, D)
    v = value.transpose(0, 1, 4, 2, 3, 5).reshape(B, L, M, H * W, D)

    out = jnp.zeros((B, Lq, M, D), value.dtype)
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        cx = x0 + dx
        cy = y0 + dy
        w_corner = (lx if dx else (1.0 - lx)) * (ly if dy else (1.0 - ly))
        in_range = (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
        w_corner = jnp.where(in_range, w_corner, 0.0) * attention_weights
        idx = (jnp.clip(cy, 0, H - 1) * W + jnp.clip(cx, 0, W - 1)).astype(jnp.int32)
        # idx: (B, Lq, M, L, P) -> (B, L, M, Lq*P)
        idx_g = idx.transpose(0, 3, 2, 1, 4).reshape(B, L, M, Lq * P)
        gathered = jnp.take_along_axis(v, idx_g[..., None], axis=3)  # (B, L, M, Lq*P, D)
        gathered = gathered.reshape(B, L, M, Lq, P, D)
        w_g = w_corner.transpose(0, 3, 2, 1, 4)  # (B, L, M, Lq, P)
        out = out + jnp.einsum("blmqpd,blmqp->bqmd", gathered, w_g.astype(value.dtype))
    return out.reshape(B, Lq, M * D)


def ms_deform_attn_reference(value, sampling_locations, attention_weights):
    """Dense einsum-free oracle using explicit loops over levels/points.

    Slow but direct transliteration of grid_sample semantics; used by tests
    (mirrors the reference's dual-implementation pattern, ops/test.py:31-61).
    """
    import numpy as np

    value = np.asarray(value, np.float64)
    locs = np.asarray(sampling_locations, np.float64)
    attw = np.asarray(attention_weights, np.float64)
    B, L, H, W, M, D = value.shape
    _, Lq, _, _, P, _ = locs.shape
    out = np.zeros((B, Lq, M, D))
    for b in range(B):
        for q in range(Lq):
            for m in range(M):
                for l in range(L):
                    for p in range(P):
                        xx = locs[b, q, m, l, p, 0] * W - 0.5
                        yy = locs[b, q, m, l, p, 1] * H - 0.5
                        x0, y0 = int(np.floor(xx)), int(np.floor(yy))
                        lx, ly = xx - x0, yy - y0
                        acc = np.zeros(D)
                        for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                            cx, cy = x0 + dx, y0 + dy
                            if 0 <= cx < W and 0 <= cy < H:
                                w_c = (lx if dx else 1 - lx) * (ly if dy else 1 - ly)
                                acc += w_c * value[b, l, cy, cx, m]
                        out[b, q, m] += attw[b, q, m, l, p] * acc
    return out.reshape(B, Lq, M * D)
