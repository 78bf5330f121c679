"""ConvNeXt backbone, TPU-native flax/NHWC.

Reference: unicorn/models/backbone/convnext.py:57-211. Returns stride-8/16/32
features (stages 1..3), each with a LayerNorm applied (reference `norm{i}`).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from . import blocks as _blocks
from .blocks import ConvNeXtBlock


def _norm_ln(name, dtype):
    """fp32 LayerNorm, or compute-dtype apply under set_fast_norms (stats
    stay fp32 inside flax for half inputs)."""
    fast = _blocks._FAST_NORMS and dtype != jnp.float32
    ln = nn.LayerNorm(epsilon=1e-6,
                      dtype=dtype if fast else jnp.float32,
                      param_dtype=jnp.float32, name=name)
    def apply(x):
        return ln(x if fast else x.astype(jnp.float32)).astype(dtype)
    return apply


def space_to_depth_4x4(x):
    """(B, H, W, C) -> (B, H/4, W/4, 16C), patch-major (dy, dx, c) order —
    exactly the contraction order of a stride-4 4x4 conv kernel (kh, kw, cin).
    """
    b, h, w, c = x.shape
    xp = x.reshape(b, h // 4, 4, w // 4, 4, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 4, w // 4, 16 * c)


class PatchEmbed4x4(nn.Module):
    """The ConvNeXt stem (4x4/4 conv) as space-to-depth + matmul.

    A stride-4 4x4 conv is a non-overlapping patch embed. On TPU the
    device-side repacking of an (H, W, 3) image into patches costs
    ~0.7 ms/frame at 800x1280 (tiny-minor-dim relayout) HOWEVER it is
    phrased (conv im2col or explicit reshape+transpose), while the stem
    matmul from pre-packed (H/4, W/4, 48) input costs ~0.05 ms. This module
    therefore also accepts input already packed by `space_to_depth_4x4`
    (detected by the 16x channel count) so streaming drivers can ingest
    frames in packed form. Parameter tree (kernel (4,4,cin,C), bias (C,))
    is identical to nn.Conv so checkpoints and the torch converter are
    unaffected.
    """

    features: int
    in_chans: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = self.in_chans
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (4, 4, cin, self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        if x.shape[-1] == cin:
            x = space_to_depth_4x4(x)
        assert x.shape[-1] == 16 * cin, (
            f"PatchEmbed4x4 expects {cin} or {16 * cin} channels, got {x.shape}")
        y = x.astype(self.dtype) @ kernel.reshape(16 * cin, self.features).astype(self.dtype)
        return y + bias.astype(self.dtype)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    layer_scale_init_value: float = 1e-6
    dtype: Any = jnp.float32
    exact_gelu: bool = True
    # Rematerialize each block under grad (reference convnext.py use_checkpoint
    # role): drops the 4x-width MLP hidden activations from the backward
    # residency — the largest activation term at 800x1280 (≈0.2 GB/block at
    # stage 0). Numerically identical; enable for training, off for serving.
    #   False      — no remat
    #   True       — full block remat (recomputes EVERYTHING incl. the
    #                VPU-serial dw7x7 in bwd; -40% memory, +6-12% time)
    #   "dw"       — selective: saves the dw7x7 output (checkpoint_name in
    #                ConvNeXtBlock), recomputes only the LN/MLP/GELU tail —
    #                same dominant memory win without re-paying the dw wall
    remat: Any = False

    @nn.compact
    def __call__(self, x):
        if self.remat == "dw":
            Block = nn.remat(
                ConvNeXtBlock,
                policy=jax.checkpoint_policies.save_only_these_names("dw_out"),
            )
        elif self.remat:
            Block = nn.remat(ConvNeXtBlock)
        else:
            Block = ConvNeXtBlock
        outs = []
        for i in range(4):
            if i == 0:
                x = PatchEmbed4x4(
                    self.dims[0], dtype=self.dtype, name="stem_conv",
                )(x)
                x = _norm_ln("stem_norm", self.dtype)(x)
            else:
                x = _norm_ln(f"down_norm{i}", self.dtype)(x)
                x = nn.Conv(
                    self.dims[i], kernel_size=(2, 2), strides=(2, 2),
                    dtype=self.dtype, param_dtype=jnp.float32, name=f"down_conv{i}",
                )(x)
            for j in range(self.depths[i]):
                x = Block(
                    self.dims[i], self.layer_scale_init_value, dtype=self.dtype,
                    exact_gelu=self.exact_gelu, name=f"stage{i}_block{j}",
                )(x)
            if i >= 1:
                out = _norm_ln(f"out_norm{i}", self.dtype)(x)
                outs.append(out)
        return tuple(outs)  # strides 8, 16, 32


def convnext_tiny(dtype=jnp.float32, exact_gelu=True, remat=False):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768), dtype=dtype,
                    exact_gelu=exact_gelu, remat=remat)


def convnext_base(dtype=jnp.float32, exact_gelu=True, remat=False):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024), dtype=dtype,
                    exact_gelu=exact_gelu, remat=remat)


def convnext_large(dtype=jnp.float32, exact_gelu=True, remat=False):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536), dtype=dtype,
                    exact_gelu=exact_gelu, remat=remat)


CONVNEXT_OUT_CHANNELS = {
    "convnext_tiny": (192, 384, 768),
    "convnext": (192, 384, 768),
    "convnext_base": (256, 512, 1024),
    "convnext_large": (384, 768, 1536),
}
