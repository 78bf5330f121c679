"""CSPDarknet backbone, TPU-native flax/NHWC.

Reference: unicorn/models/backbone/darknet.py:97-179 (CSPDarknet). Returns the
stride-8/16/32 feature maps (dark3, dark4, dark5).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, Focus, SPPBottleneck


class CSPDarknet(nn.Module):
    dep_mul: float = 1.0
    wid_mul: float = 1.0
    depthwise: bool = False
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        conv = DWConv if self.depthwise else BaseConv
        base_ch = int(self.wid_mul * 64)
        base_depth = max(round(self.dep_mul * 3), 1)
        dt = self.dtype

        x = Focus(base_ch, ksize=3, act=self.act, dtype=dt, name="stem")(x)

        x = conv(base_ch * 2, 3, 2, act=self.act, dtype=dt)(x)
        x = CSPLayer(base_ch * 2, n=base_depth, depthwise=self.depthwise, act=self.act, dtype=dt)(x)

        x = conv(base_ch * 4, 3, 2, act=self.act, dtype=dt)(x)
        x = CSPLayer(base_ch * 4, n=base_depth * 3, depthwise=self.depthwise, act=self.act, dtype=dt)(x)
        c3 = x  # stride 8

        x = conv(base_ch * 8, 3, 2, act=self.act, dtype=dt)(x)
        x = CSPLayer(base_ch * 8, n=base_depth * 3, depthwise=self.depthwise, act=self.act, dtype=dt)(x)
        c4 = x  # stride 16

        x = conv(base_ch * 16, 3, 2, act=self.act, dtype=dt)(x)
        x = SPPBottleneck(base_ch * 16, act=self.act, dtype=dt)(x)
        x = CSPLayer(
            base_ch * 16, n=base_depth, shortcut=False, depthwise=self.depthwise,
            act=self.act, dtype=dt,
        )(x)
        c5 = x  # stride 32

        return c3, c4, c5
