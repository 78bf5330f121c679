"""ResNet-50 backbone, TPU-native flax/NHWC (GroupNorm variant).

Reference: unicorn/models/backbone/resnet.py:127-287. Returns stride-8/16/32
features (layer2, layer3, layer4 outputs: 512/1024/2048 channels).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import GroupNorm32


class BottleneckRes(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32)(x)
        out = GroupNorm32(dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32)(out)
        out = GroupNorm32(dtype=self.dtype)(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32)(out)
        out = GroupNorm32(dtype=self.dtype)(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
            identity = GroupNorm32(dtype=self.dtype)(identity)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    layers: Sequence[int] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = GroupNorm32(dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = (64, 128, 256, 512)
        for stage in range(4):
            stride = 1 if stage == 0 else 2
            x = BottleneckRes(planes[stage], stride=stride, downsample=True,
                              dtype=self.dtype)(x)
            for _ in range(self.layers[stage] - 1):
                x = BottleneckRes(planes[stage], dtype=self.dtype)(x)
            if stage >= 1:
                outs.append(x)
        return tuple(outs)  # strides 8, 16, 32: 512/1024/2048 ch


RESNET_OUT_CHANNELS = {"resnet50": (512, 1024, 2048)}
