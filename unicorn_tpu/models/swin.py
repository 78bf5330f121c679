"""Swin Transformer backbone, TPU-native flax/NHWC.

Reference: unicorn/models/backbone/swin_transformer.py:447-661 (+ config at
swin_config.py). Standard Swin-T/S/B with windowed attention + shifted
windows; outputs stride-8/16/32 features with per-stage LayerNorms, matching
the backbone contract of pafpn.build_backbone.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def window_partition(x, ws: int):
    """(B, H, W, C) -> (B*nW, ws*ws, C)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def window_reverse(windows, ws: int, H: int, W: int):
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


def relative_position_index(ws: int, table_ws: int | None = None):
    """Index into the (2*table_ws-1)^2 bias table for an effective window of
    size ws <= table_ws (the table stays input-size-independent)."""
    table_ws = table_ws or ws
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0) + table_ws - 1
    return rel[..., 0] * (2 * table_ws - 1) + rel[..., 1]  # (ws^2, ws^2)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int            # effective (possibly clamped) window
    table_window: int = 7       # static table size (input-independent params)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW*B, N, C); mask: (nW, N, N) or None."""
        Bn, N, C = x.shape
        h = self.num_heads
        head_dim = C // h
        scale = head_dim ** -0.5
        qkv = nn.Dense(C * 3, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(Bn, N, 3, h, head_dim).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * scale, qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k)

        rpb_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.table_window - 1) ** 2, h), jnp.float32)
        idx = relative_position_index(self.window_size, self.table_window)
        bias = rpb_table[idx.reshape(-1)].reshape(N, N, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)

        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(Bn // nW, nW, h, N, N) \
                + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bn, N, C)
        return nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C)."""
        B, H, W, C = x.shape
        ws = min(self.window_size, H, W)
        ss = 0 if ws == min(H, W) else min(self.shift_size, ws - 1)

        shortcut = x
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm1")(x.astype(jnp.float32)).astype(self.dtype)
        pad_b = (-H) % ws
        pad_r = (-W) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        Hp, Wp = H + pad_b, W + pad_r

        if ss > 0:
            x = jnp.roll(x, (-ss, -ss), axis=(1, 2))
            # attention mask for shifted windows
            img_mask = np.zeros((1, Hp, Wp, 1))
            cnt = 0
            for hsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                for wsl in (slice(0, -ws), slice(-ws, -ss), slice(-ss, None)):
                    img_mask[:, hsl, wsl, :] = cnt
                    cnt += 1
            mw = window_partition(jnp.asarray(img_mask), ws).reshape(-1, ws * ws)
            attn_mask = jnp.where(mw[:, None, :] != mw[:, :, None], -100.0, 0.0)
        else:
            attn_mask = None

        windows = window_partition(x, ws)
        attn_out = WindowAttention(self.dim, self.num_heads, ws,
                                   table_window=self.window_size,
                                   dtype=self.dtype, name="attn")(windows,
                                                                  attn_mask)
        x = window_reverse(attn_out, ws, Hp, Wp)
        if ss > 0:
            x = jnp.roll(x, (ss, ss), axis=(1, 2))
        x = x[:, :H, :W]
        x = shortcut + x

        y = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="norm2")(x.astype(jnp.float32)).astype(self.dtype)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    dtype: Any = jnp.float32
    # per-block grad remat (reference swin_transformer.py use_checkpoint
    # role). The selective remat="dw" policy is ConvNeXt-only (there is no
    # dw7x7 here); any truthy value — including "dw" passed through a
    # backbone-agnostic config — means full block remat.
    remat: bool = False

    @nn.compact
    def __call__(self, x):
        Block = nn.remat(SwinBlock) if self.remat else SwinBlock
        # patch embed: conv4x4 stride 4 + LN
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    param_dtype=jnp.float32, name="patch_embed")(x)
        x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                         name="patch_norm")(x.astype(jnp.float32)).astype(self.dtype)
        outs = []
        dim = self.embed_dim
        for i, depth in enumerate(self.depths):
            for j in range(depth):
                x = Block(
                    dim, self.num_heads[i], self.window_size,
                    shift_size=0 if j % 2 == 0 else self.window_size // 2,
                    dtype=self.dtype, name=f"stage{i}_block{j}",
                )(x)
            # collect stride-8/16/32 outputs (stages 1..3) with LN
            if i >= 1:
                out = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                   name=f"out_norm{i}")(
                    x.astype(jnp.float32)).astype(self.dtype)
                outs.append(out)
            # patch merging between stages
            if i < len(self.depths) - 1:
                B, H, W, C = x.shape
                x = x.reshape(B, H // 2, 2, W // 2, 2, C)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
                x = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32,
                                 name=f"merge_norm{i}")(
                    x.astype(jnp.float32)).astype(self.dtype)
                x = nn.Dense(2 * C, use_bias=False, dtype=self.dtype,
                             param_dtype=jnp.float32, name=f"merge_reduce{i}")(x)
                dim = 2 * C
        return tuple(outs)


def swin_tiny(dtype=jnp.float32, remat=False):
    return SwinTransformer(embed_dim=96, depths=(2, 2, 6, 2),
                           num_heads=(3, 6, 12, 24), dtype=dtype, remat=remat)


def swin_small(dtype=jnp.float32, remat=False):
    """Swin-S (reference swin_transformer.py:447-661 family via
    swin_config.py: embed 96, depths [2,2,18,2], heads [3,6,12,24])."""
    return SwinTransformer(embed_dim=96, depths=(2, 2, 18, 2),
                           num_heads=(3, 6, 12, 24), dtype=dtype, remat=remat)


def swin_base(dtype=jnp.float32, remat=False):
    return SwinTransformer(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), dtype=dtype, remat=remat)


def swin_large(dtype=jnp.float32, remat=False):
    return SwinTransformer(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), dtype=dtype, remat=remat)


SWIN_BUILDERS = {"swin_tiny": swin_tiny, "swin_small": swin_small,
                 "swin_base": swin_base, "swin_large": swin_large}

SWIN_OUT_CHANNELS = {"swin_tiny_patch4_window7_224": (192, 384, 768),
                     "swin_tiny": (192, 384, 768),
                     "swin_small": (192, 384, 768),
                     "swin_base": (256, 512, 1024),
                     "swin_large": (384, 768, 1536)}
