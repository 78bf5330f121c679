"""CondInst mask machinery: mask branch + controller head extension.

Reference: unicorn/models/condinst/mask_branch.py:17-162 (MaskBranch: fuse
P3/P4/P5 -> 8-ch mask features + optional RAFT up-mask layer + semantic
focal loss head) and unicorn/models/unicorn_head_mask.py:78-87,334-344
(per-level controller convs producing 169 dynamic params from the reg tower).
"""
from __future__ import annotations

import math
from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dynamic_conv import aligned_bilinear
from .blocks import GroupNorm32


class ConvBlock(nn.Module):
    """conv3x3 + norm + relu (conv_with_kaiming_uniform equivalent)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = GroupNorm32(dtype=self.dtype)(x)
        return nn.relu(x)


class MaskBranch(nn.Module):
    """Fuse stride-8/16/32 FPN features into 8-channel mask features.

    Returns (mask_feats (B, H8, W8, 8), up_mask or None, sem_logits or None).
    """

    out_channels: int = 8
    channels: int = 128
    num_convs: int = 4
    use_raft: bool = False
    up_rate: int = 8
    sem_loss_on: bool = False
    num_classes: int = 80
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fpn_feats):
        p3, p4, p5 = fpn_feats
        x = ConvBlock(self.channels, dtype=self.dtype, name="refine0")(p3)
        for i, p in enumerate((p4, p5), start=1):
            xp = ConvBlock(self.channels, dtype=self.dtype, name=f"refine{i}")(p)
            factor = x.shape[1] // xp.shape[1]
            x = x + aligned_bilinear(xp.astype(jnp.float32), factor).astype(x.dtype)
        tower = x
        for i in range(self.num_convs):
            tower = ConvBlock(self.channels, dtype=self.dtype, name=f"tower{i}")(tower)
        mask_feats = nn.Conv(max(self.out_channels, 1), (1, 1), dtype=self.dtype,
                             param_dtype=jnp.float32, name="tower_out")(tower)

        up_mask = None
        if self.use_raft:
            # reference mask_branch.py:159 applies up_mask_layer to the FUSED
            # refine output x (the tower input), not the tower output
            u = nn.Conv(self.channels, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="up_mask_conv1")(x)
            up_mask = nn.Conv(self.up_rate * self.up_rate * 9, (1, 1),
                              dtype=self.dtype, param_dtype=jnp.float32,
                              name="up_mask_conv2")(nn.relu(u))

        sem_logits = None
        if self.sem_loss_on:
            s = ConvBlock(self.channels, dtype=self.dtype, name="seg_head0")(p3)
            s = ConvBlock(self.channels, dtype=self.dtype, name="seg_head1")(s)
            bias_init = nn.initializers.constant(
                -math.log((1 - 0.01) / 0.01))
            sem_logits = nn.Conv(self.num_classes, (1, 1), bias_init=bias_init,
                                 dtype=self.dtype, param_dtype=jnp.float32,
                                 name="seg_logits")(s)
        return mask_feats, up_mask, sem_logits


def anchor_locations_and_levels(hw_list, strides):
    """Per-anchor image-coord centers and fpn level ids, concatenated in the
    same order as the head's flattened outputs (unicorn_head_mask.py
    locations/fpn_levels buffers). Returns (A, 2), (A,)."""
    locs, lvls = [], []
    for lvl, ((h, w), s) in enumerate(zip(hw_list, strides)):
        xs = (jnp.arange(w, dtype=jnp.float32) * s) + s // 2
        ys = (jnp.arange(h, dtype=jnp.float32) * s) + s // 2
        yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
        locs.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=1))
        lvls.append(jnp.full((h * w,), lvl, jnp.int32))
    return jnp.concatenate(locs, 0), jnp.concatenate(lvls, 0)
