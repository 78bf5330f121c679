"""YOLOX-family conv building blocks, TPU-native (flax.linen, NHWC).

Re-designs of the reference blocks (unicorn/models/backbone/network_blocks.py:29-210):
  * layout is NHWC — XLA's preferred TPU conv layout (MXU-friendly)
  * normalization defaults to GroupNorm(16) — per-sample, so data-parallel pjit
    needs no cross-replica norm sync (the reference converts BN->GN for the
    unified model anyway, unicorn/exp/unicorn_track.py:450-470)
  * compute dtype is configurable (bfloat16 on TPU), params stay float32
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import ad_checkpoint as _adc

Dtype = Any


def get_activation(name: str = "silu"):
    if name == "silu":
        return nn.silu
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.1)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"Unsupported act type: {name}")


_FAST_NORMS = False


def set_fast_norms(on: bool):
    """Serving-only switch: norm STATISTICS stay fp32 (flax upcasts half
    inputs for mean/var) but the normalize/affine APPLY runs in the compute
    dtype, skipping the materialized fp32 round-trip per norm. Off by
    default — training and all parity tests keep exact fp32 normalization.
    Callers must flip this BEFORE tracing (it changes the jitted graph)."""
    global _FAST_NORMS
    _FAST_NORMS = bool(on)


class GroupNorm32(nn.Module):
    """GroupNorm that normalizes in float32 regardless of compute dtype
    (bf16 apply under set_fast_norms — same param tree either way)."""

    num_groups: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fast = _FAST_NORMS and self.dtype != jnp.float32
        y = nn.GroupNorm(
            num_groups=min(self.num_groups, x.shape[-1]),
            # the reference uni model's GNs come from BN conversion with
            # bn.eps=1e-3 (exp/unicorn_track.py:121-156) — keep eps identical
            # for checkpoint parity
            epsilon=1e-3,
            dtype=self.dtype if fast else jnp.float32,
            param_dtype=jnp.float32,
        )(x if fast else x.astype(jnp.float32))
        return y.astype(self.dtype)


class BaseConv(nn.Module):
    """Conv2d -> GroupNorm -> act (reference BaseConv, network_blocks.py:29-54)."""

    out_channels: int
    ksize: int = 1
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    use_norm: bool = True
    bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.ksize - 1) // 2
        x = nn.Conv(
            features=self.out_channels,
            kernel_size=(self.ksize, self.ksize),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.groups,
            use_bias=self.bias or not self.use_norm,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.use_norm:
            x = GroupNorm32(dtype=self.dtype)(x)
        return get_activation(self.act)(x)


class DWConv(nn.Module):
    """Depthwise conv + pointwise conv (network_blocks.py:57-76)."""

    out_channels: int
    ksize: int
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = BaseConv(in_ch, self.ksize, self.stride, groups=in_ch, act=self.act, dtype=self.dtype)(x)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype)(x)


class Bottleneck(nn.Module):
    """Standard bottleneck (network_blocks.py:79-104)."""

    out_channels: int
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        y = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype)(x)
        conv = DWConv if self.depthwise else BaseConv
        y = conv(self.out_channels, 3, 1, act=self.act, dtype=self.dtype)(y)
        if self.shortcut and x.shape[-1] == self.out_channels:
            y = y + x
        return y


class ResLayer(nn.Module):
    """Residual layer (network_blocks.py:107-124)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        y = BaseConv(in_ch // 2, 1, 1, act="lrelu", dtype=self.dtype)(x)
        y = BaseConv(in_ch, 3, 1, act="lrelu", dtype=self.dtype)(y)
        return x + y


class SPPBottleneck(nn.Module):
    """Spatial pyramid pooling (network_blocks.py:120-143)."""

    out_channels: int
    kernel_sizes: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = x.shape[-1] // 2
        x = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype)(x)
        pools = [x]
        for ks in self.kernel_sizes:
            pad = ks // 2
            pools.append(
                nn.max_pool(
                    x,
                    window_shape=(ks, ks),
                    strides=(1, 1),
                    padding=((pad, pad), (pad, pad)),
                )
            )
        x = jnp.concatenate(pools, axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype)(x)


class CSPLayer(nn.Module):
    """C3: CSP bottleneck with 3 convs (network_blocks.py:145-186)."""

    out_channels: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    depthwise: bool = False
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hidden = int(self.out_channels * self.expansion)
        x1 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype)(x)
        x2 = BaseConv(hidden, 1, 1, act=self.act, dtype=self.dtype)(x)
        for _ in range(self.n):
            x1 = Bottleneck(
                hidden, self.shortcut, 1.0, self.depthwise, act=self.act, dtype=self.dtype
            )(x1)
        x = jnp.concatenate([x1, x2], axis=-1)
        return BaseConv(self.out_channels, 1, 1, act=self.act, dtype=self.dtype)(x)


class Focus(nn.Module):
    """Space-to-depth stem (network_blocks.py:189-210).

    NHWC: (B, H, W, C) -> (B, H/2, W/2, 4C) -> conv.
    """

    out_channels: int
    ksize: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        tl = x[:, ::2, ::2, :]
        bl = x[:, 1::2, ::2, :]
        tr = x[:, ::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return BaseConv(self.out_channels, self.ksize, self.stride, act=self.act, dtype=self.dtype)(x)


_PALLAS_DW = False


def set_pallas_dw(on: bool):
    """Serving switch: route every ConvNeXt dw7x7 through the dedicated
    Pallas kernel (ops/pallas_convnext.dwconv7x7) instead of XLA's grouped
    conv. Off by default; flip BEFORE tracing (it changes the jitted
    graph). Gradients still flow through the XLA form (custom VJP)."""
    global _PALLAS_DW
    _PALLAS_DW = bool(on)


class DepthwiseConv7x7(nn.Module):
    """Param-compatible stand-in for nn.Conv(dim, (7,7), groups=dim):
    identical param names ('kernel' (7,7,1,C), 'bias' (C,)), shapes, and
    lecun_normal/zeros init, so checkpoints and the torch converter see the
    same tree — but the forward can route through the Pallas dw kernel
    under set_pallas_dw (BASELINE.md roofline: the dw chain is the trunk's
    VPU wall; this is the lever that attacks it without changing numerics
    beyond bf16 accumulation order)."""

    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, self.dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.dim,), jnp.float32)
        from unicorn_tpu.ops import pallas_convnext as pc
        if _PALLAS_DW and x.ndim == 4 and jax.default_backend() == "tpu":
            return pc.dwconv7x7(x.astype(self.dtype), kernel, bias)
        if pc._DW_CUSTOM_VJP and x.ndim == 4:
            # training switch (set_dw_custom_vjp): same forward program,
            # restructured backward (see ops/pallas_convnext.py)
            return pc.dwconv7x7_cvjp(x.astype(self.dtype), kernel, bias)
        return pc.dwconv7x7_ref(x.astype(self.dtype), kernel, bias)


class ConvNeXtBlock(nn.Module):
    """ConvNeXt block (dw7x7 + LN + MLP + layer-scale), used both as backbone
    stage block and as the unified head's attention block
    (reference unicorn/models/backbone/convnext.py:19-55).
    """

    dim: int
    layer_scale_init_value: float = 1e-6
    dtype: Dtype = jnp.float32
    # exact (erf) GELU matches torch nn.GELU bit-for-bit (checkpoint parity);
    # the tanh approximation is ~2.8 ms/frame faster across the 27 backbone
    # blocks at 800x1280 and is the standard serving approximation
    exact_gelu: bool = True

    @nn.compact
    def __call__(self, x):
        inp = x
        x = DepthwiseConv7x7(self.dim, dtype=self.dtype, name="Conv_0")(x)
        # tag for the selective-remat policy (remat="dw"): the dw7x7 is the
        # VPU-serial expensive op — save its output, recompute the cheap
        # MXU/elementwise tail. No-op outside jax.checkpoint.
        x = _adc.checkpoint_name(x, "dw_out")
        fast = _FAST_NORMS and self.dtype != jnp.float32
        x = nn.LayerNorm(
            epsilon=1e-6, dtype=self.dtype if fast else jnp.float32,
            param_dtype=jnp.float32,
        )(x if fast else x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.gelu(x, approximate=not self.exact_gelu)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32)(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda key, shape: self.layer_scale_init_value * jnp.ones(shape, jnp.float32),
                (self.dim,),
            )
            x = x * gamma.astype(self.dtype)
        return inp + x


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsampling, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def pixel_shuffle_2x(x):
    """PixelShuffle(2), NHWC: (B, H, W, 4C) -> (B, 2H, 2W, C).

    Matches torch.nn.PixelShuffle channel ordering: input channel c*4 + (dy*2+dx).
    """
    b, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h, w, c, 2, 2)  # (..., C, dy, dx)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, dy, w, dx, c
    return x.reshape(b, 2 * h, 2 * w, c)


def interpolate_bilinear(x, out_h: int, out_w: int):
    """Bilinear resize, NHWC, matching torch F.interpolate(align_corners=False)
    semantics (half-pixel, no anti-aliasing)."""
    return jax.image.resize(
        x, (x.shape[0], out_h, out_w, x.shape[-1]), method="bilinear", antialias=False
    )
