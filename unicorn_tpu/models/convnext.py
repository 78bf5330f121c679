"""ConvNeXt backbone, TPU-native flax/NHWC.

Reference: unicorn/models/backbone/convnext.py:57-211. Returns stride-8/16/32
features (stages 1..3), each with a LayerNorm applied (reference `norm{i}`).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import ConvNeXtBlock


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.float32
    exact_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        outs = []
        for i in range(4):
            if i == 0:
                x = nn.Conv(
                    self.dims[0], kernel_size=(4, 4), strides=(4, 4),
                    dtype=self.dtype, param_dtype=jnp.float32, name="stem_conv",
                )(x)
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32, name="stem_norm"
                )(x.astype(jnp.float32)).astype(self.dtype)
            else:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32,
                    name=f"down_norm{i}",
                )(x.astype(jnp.float32)).astype(self.dtype)
                x = nn.Conv(
                    self.dims[i], kernel_size=(2, 2), strides=(2, 2),
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"down_conv{i}",
                )(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(
                    self.dims[i], self.layer_scale_init_value, dtype=self.dtype,
                    exact_gelu=self.exact_gelu, name=f"stage{i}_block{j}",
                )(x)
            if i >= 1:
                out = nn.LayerNorm(
                    epsilon=1e-6, dtype=jnp.float32, param_dtype=jnp.float32,
                    name=f"out_norm{i}",
                )(x.astype(jnp.float32)).astype(self.dtype)
                outs.append(out)
        return tuple(outs)  # strides 8, 16, 32


def convnext_tiny(dtype=jnp.float32, exact_gelu=True):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), dtype=dtype,
                    exact_gelu=exact_gelu)


def convnext_base(dtype=jnp.float32, exact_gelu=True):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), dtype=dtype,
                    exact_gelu=exact_gelu)


def convnext_large(dtype=jnp.float32, exact_gelu=True):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), dtype=dtype,
                    exact_gelu=exact_gelu)


CONVNEXT_OUT_CHANNELS = {
    "convnext_tiny": (192, 384, 768),
    "convnext": (192, 384, 768),
    "convnext_base": (256, 512, 1024),
    "convnext_large": (384, 768, 1536),
}
