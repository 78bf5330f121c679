"""Reference<->current frame feature interaction, TPU-native flax/NHWC.

Three modes, config-compatible with the reference (unicorn/models/
deformable_transformer.py, transformer_encoder.py):
  * "conv"   — per-frame conv block (Conv_Inter, deformable_transformer.py:192-207)
  * "full"   — joint full-attention encoder over both frames' tokens
  * "deform" — 1-layer deformable-attention encoder treating the two frames as
               two "levels" (DeformableTransformer built with enc_layers=1,
               num_feature_levels=2, n_points=4)

Also contains the learned positional embedding (position_encoding.py:10-42)
and the bottleneck + upsample/embedding modules (unicorn.py:36-44).
"""
from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_attn import ms_deform_attn
from .blocks import GroupNorm32, interpolate_bilinear, pixel_shuffle_2x


class PositionEmbeddingLearned(nn.Module):
    """Learned row/col embedding interpolated to (h, w). Output (B, H, W, C)."""

    num_pos_feats: int = 128
    sz: int = 40
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, bs: int, h: int, w: int):
        col = self.param("col_embed", nn.initializers.uniform(1.0),
                         (self.sz, self.num_pos_feats), jnp.float32)
        row = self.param("row_embed", nn.initializers.uniform(1.0),
                         (self.sz, self.num_pos_feats), jnp.float32)
        x_emb = jnp.broadcast_to(col[None, :, :], (self.sz, self.sz, self.num_pos_feats))
        y_emb = jnp.broadcast_to(row[:, None, :], (self.sz, self.sz, self.num_pos_feats))
        pos = jnp.concatenate([x_emb, y_emb], axis=-1)[None]  # (1, sz, sz, 2C)
        pos = interpolate_bilinear(pos, h, w)
        return jnp.broadcast_to(pos, (bs, h, w, pos.shape[-1])).astype(self.dtype)


class Bottleneck1x1(nn.Module):
    """1x1 conv + GroupNorm(32) projecting backbone dim -> 256 (unicorn.py:36-40)."""

    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nn.initializers.xavier_uniform())(x)
        y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32)(x.astype(jnp.float32))
        return y.astype(self.dtype)


class UpsampleEmbed(nn.Module):
    """PixelShuffle(2) + convs -> embedding map at stride 8 (unicorn.py:41-44)."""

    embed_dim: int = 128
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = pixel_shuffle_2x(x)  # (B, 2H, 2W, hidden/4)
        x = nn.Conv(self.hidden_dim, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Conv(self.embed_dim, (3, 3), padding=((1, 1), (1, 1)),
                       dtype=self.dtype, param_dtype=jnp.float32)(x)


class ConvInteraction(nn.Module):
    """Per-frame conv interaction (deformable_transformer.py:192-207)."""

    d_model: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, pos=None):
        conv1 = nn.Conv(self.d_model, (3, 3), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv1")
        norm = GroupNorm32(dtype=self.dtype, name="norm")
        conv2 = nn.Conv(self.d_model, (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv2")
        return tuple(conv2(nn.relu(norm(conv1(x)))) for x in feats)


class FullAttentionLayer(nn.Module):
    """Post-norm transformer encoder layer (transformer_encoder.py:49-110)."""

    d_model: int = 256
    nhead: int = 8
    dim_feedforward: int = 2048
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos):
        q = k = src + pos
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, dtype=self.dtype, param_dtype=jnp.float32,
        )(q, k, src)
        src = src + attn
        src = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)(
            src.astype(jnp.float32)).astype(self.dtype)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32)(src)
        ff = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32)(nn.relu(ff))
        src = src + ff
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)(
            src.astype(jnp.float32)).astype(self.dtype)


class FullAttentionInteraction(nn.Module):
    """Joint full attention over both frames' tokens (unicorn.py:278-299)."""

    d_model: int = 256
    nhead: int = 8
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, pos):
        b, h, w, c = feats[0].shape
        src = jnp.concatenate([f.reshape(b, h * w, c) for f in feats], axis=1)
        p = jnp.concatenate([x.reshape(b, h * w, -1) for x in pos], axis=1)
        for i in range(self.num_layers):
            src = FullAttentionLayer(self.d_model, self.nhead, dtype=self.dtype,
                                     name=f"layer{i}")(src, p)
        f1 = src[:, : h * w].reshape(b, h, w, c)
        f2 = src[:, h * w:].reshape(b, h, w, c)
        return f1, f2


def _offset_bias_init(n_heads, n_levels, n_points):
    """Directional point-offset bias init (ops/modules/ms_deform_attn.py:62-70)."""
    thetas = jnp.arange(n_heads, dtype=jnp.float32) * (2.0 * math.pi / n_heads)
    grid = jnp.stack([jnp.cos(thetas), jnp.sin(thetas)], -1)  # (M, 2)
    grid = grid / jnp.max(jnp.abs(grid), axis=-1, keepdims=True)
    grid = jnp.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    scale = jnp.arange(1, n_points + 1, dtype=jnp.float32)[None, None, :, None]
    grid = grid * scale

    def init(key, shape, dtype=jnp.float32):
        return grid.reshape(-1).astype(dtype)

    return init


class MSDeformAttnLayer(nn.Module):
    """Deformable self-attention layer over two equal-shape frame 'levels'.

    Mirrors MSDeformAttn (ops/modules/ms_deform_attn.py:30-117) +
    DeformableTransformerEncoderLayer (deformable_transformer.py:92-131).
    """

    d_model: int = 256
    n_heads: int = 8
    n_points: int = 4
    n_levels: int = 2
    dim_feedforward: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, src, pos, h: int, w: int):
        """src, pos: (B, L*h*w, C) with levels concatenated."""
        B, Lq, C = src.shape
        M, L, P = self.n_heads, self.n_levels, self.n_points
        D = C // M

        query = src + pos
        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_offset_bias_init(M, L, P),
            dtype=self.dtype, param_dtype=jnp.float32, name="sampling_offsets",
        )(query).reshape(B, Lq, M, L, P, 2)
        attw = nn.Dense(
            M * L * P, kernel_init=nn.initializers.zeros,
            dtype=self.dtype, param_dtype=jnp.float32, name="attention_weights",
        )(query).reshape(B, Lq, M, L * P)
        attw = jax.nn.softmax(attw, axis=-1).reshape(B, Lq, M, L, P)

        value = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                         dtype=self.dtype, param_dtype=jnp.float32,
                         name="value_proj")(src)
        value = value.reshape(B, L, h, w, M, D)

        # reference points: per-query normalized center, same for both levels
        yv, xv = jnp.meshgrid(jnp.arange(h) + 0.5, jnp.arange(w) + 0.5, indexing="ij")
        ref = jnp.stack([xv.reshape(-1) / w, yv.reshape(-1) / h], -1)  # (hw, 2)
        ref = jnp.tile(ref, (L, 1))  # (Lq, 2) — queries of both levels
        norm = jnp.array([w, h], jnp.float32)
        locs = ref[None, :, None, None, None, :] + offsets / norm

        out = ms_deform_attn(value, locs, attw)
        out = nn.Dense(C, kernel_init=nn.initializers.xavier_uniform(),
                       dtype=self.dtype, param_dtype=jnp.float32,
                       name="output_proj")(out)

        src = src + out
        src = nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)(
            src.astype(jnp.float32)).astype(self.dtype)
        ff = nn.Dense(self.dim_feedforward, dtype=self.dtype, param_dtype=jnp.float32)(src)
        ff = nn.Dense(C, dtype=self.dtype, param_dtype=jnp.float32)(nn.relu(ff))
        src = src + ff
        return nn.LayerNorm(dtype=jnp.float32, param_dtype=jnp.float32)(
            src.astype(jnp.float32)).astype(self.dtype)


class DeformableInteraction(nn.Module):
    """1-layer deformable encoder over two frames (deformable_transformer.py:21-89,
    built via build_deforamble_transformer with enc_layers=1)."""

    d_model: int = 256
    n_heads: int = 8
    n_points: int = 4
    num_layers: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, pos):
        b, h, w, c = feats[0].shape
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (2, self.d_model), jnp.float32
        )
        src = jnp.concatenate([f.reshape(b, h * w, c) for f in feats], axis=1)
        p = jnp.concatenate(
            [
                x.reshape(b, h * w, -1) + level_embed[i].astype(self.dtype)
                for i, x in enumerate(pos)
            ],
            axis=1,
        )
        for i in range(self.num_layers):
            src = MSDeformAttnLayer(
                self.d_model, self.n_heads, self.n_points, 2,
                dtype=self.dtype, name=f"layer{i}",
            )(src, p, h, w)
        f1 = src[:, : h * w].reshape(b, h, w, c)
        f2 = src[:, h * w:].reshape(b, h, w, c)
        return f1, f2
