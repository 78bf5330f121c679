"""YOLO PAFPN neck with pluggable backbone, TPU-native flax/NHWC.

Reference: unicorn/models/backbone/yolo_pafpn_new.py:14-161 (YOLOPAFPNNEW).
`__call__` returns (pan_out2, pan_out1, pan_out0) at strides (8, 16, 32) and
optionally the raw backbone features (for the stride-16 interaction feature).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .blocks import BaseConv, CSPLayer, DWConv, upsample_nearest_2x
from .convnext import CONVNEXT_OUT_CHANNELS, convnext_base, convnext_large, convnext_tiny
from .csp_darknet import CSPDarknet
from .resnet import ResNet50


def build_backbone(name: str, depth: float, width: float, dtype=jnp.float32,
                   exact_gelu: bool = True, remat: bool = False):
    """Build the raw feature extractor producing stride-8/16/32 features.

    Returns (module, out_channels) where out_channels are the raw stride-8/16/32
    channel counts.  remat enables per-block gradient rematerialization
    (training memory knob; numerically identical — convnext and swin).
    """
    if name.startswith("convnext"):
        fn = {
            "convnext": convnext_tiny,
            "convnext_tiny": convnext_tiny,
            "convnext_base": convnext_base,
            "convnext_large": convnext_large,
        }[name]
        return (fn(dtype=dtype, exact_gelu=exact_gelu, remat=remat),
                CONVNEXT_OUT_CHANNELS[name])
    if name.startswith("swin"):
        from .swin import SWIN_BUILDERS, SWIN_OUT_CHANNELS

        key = name if name in SWIN_BUILDERS else "swin_tiny"
        return (SWIN_BUILDERS[key](dtype=dtype, remat=remat),
                SWIN_OUT_CHANNELS[key])
    if name == "resnet50":
        return ResNet50(dtype=dtype), (512, 1024, 2048)
    if name == "csp_darknet":
        ch = (int(256 * width), int(512 * width), int(1024 * width))
        return CSPDarknet(dep_mul=depth, wid_mul=width, dtype=dtype), ch
    raise ValueError(f"unsupported backbone: {name}")


class YOLOPAFPN(nn.Module):
    """Backbone + PAFPN (top-down and bottom-up fusion)."""

    depth: float = 1.0
    width: float = 1.0
    in_channels: Sequence[int] = (256, 512, 1024)
    depthwise: bool = False
    act: str = "silu"
    backbone_name: str = "convnext_tiny"
    dtype: Any = jnp.float32
    exact_gelu: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x, return_base_feat: bool = False, run_fpn: bool = True):
        conv = DWConv if self.depthwise else BaseConv
        c0, c1, c2 = [int(c * self.width) for c in self.in_channels]
        dt = self.dtype

        backbone, raw_ch = build_backbone(
            self.backbone_name, self.depth, self.width, dtype=dt,
            exact_gelu=self.exact_gelu, remat=self.remat,
        )
        x2, x1, x0 = backbone(x)  # strides 8, 16, 32

        if not run_fpn:
            return (x2, x1, x0)

        if raw_ch != (c0, c1, c2):
            x2_adj = BaseConv(c0, 1, 1, act=self.act, dtype=dt, name="adjust2")(x2)
            x1_adj = BaseConv(c1, 1, 1, act=self.act, dtype=dt, name="adjust1")(x1)
            x0_adj = BaseConv(c2, 1, 1, act=self.act, dtype=dt, name="adjust0")(x0)
        else:
            x2_adj, x1_adj, x0_adj = x2, x1, x0

        n = round(3 * self.depth)
        # top-down
        fpn_out0 = BaseConv(c1, 1, 1, act=self.act, dtype=dt, name="lateral_conv0")(x0_adj)
        f_out0 = jnp.concatenate([upsample_nearest_2x(fpn_out0), x1_adj], axis=-1)
        f_out0 = CSPLayer(c1, n=n, shortcut=False, depthwise=self.depthwise,
                          act=self.act, dtype=dt, name="C3_p4")(f_out0)

        fpn_out1 = BaseConv(c0, 1, 1, act=self.act, dtype=dt, name="reduce_conv1")(f_out0)
        f_out1 = jnp.concatenate([upsample_nearest_2x(fpn_out1), x2_adj], axis=-1)
        pan_out2 = CSPLayer(c0, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=dt, name="C3_p3")(f_out1)  # stride 8

        # bottom-up
        p_out1 = conv(c0, 3, 2, act=self.act, dtype=dt, name="bu_conv2")(pan_out2)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = CSPLayer(c1, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=dt, name="C3_n3")(p_out1)  # stride 16

        p_out0 = conv(c1, 3, 2, act=self.act, dtype=dt, name="bu_conv1")(pan_out1)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = CSPLayer(c2, n=n, shortcut=False, depthwise=self.depthwise,
                            act=self.act, dtype=dt, name="C3_n4")(p_out0)  # stride 32

        outputs = (pan_out2, pan_out1, pan_out0)
        if return_base_feat:
            return outputs, (x2, x1, x0)
        return outputs
