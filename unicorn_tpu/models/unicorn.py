"""The unified Unicorn model, TPU-native flax assembly.

Reference: unicorn/models/unicorn.py:14-507. The reference's mode-dispatched
forward (mode in {backbone, interaction, upsample, loss, whole}) becomes
separate flax methods invoked via `model.apply(params, ..., method=...)` — each
one jit-compiles to its own XLA program, exactly matching how the inference
drivers stage the pipeline (SOT caches the reference-frame backbone output and
re-runs only interaction+upsample+head per frame).
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .heads import UnicornHead
from .interaction import (
    Bottleneck1x1,
    ConvInteraction,
    DeformableInteraction,
    FullAttentionInteraction,
    PositionEmbeddingLearned,
    UpsampleEmbed,
)
from .pafpn import YOLOPAFPN


class Unicorn(nn.Module):
    """Backbone + interaction + embedding + unified head."""

    num_classes: int = 8
    depth: float = 1.0
    width: float = 1.0
    in_channels: Sequence[int] = (192, 384, 768)
    backbone_name: str = "convnext_tiny"
    act: str = "silu"
    interact_mode: str = "deform"   # "deform" | "full" | "conv"
    embed_dim: int = 128
    hidden_dim: int = 256
    use_attention: bool = True
    n_layer_att: int = 3
    unshared_obj: bool = True
    unshared_reg: bool = True
    fuse_method: str = "sum"
    learnable_fuse: bool = True
    use_mask: bool = False          # CondInst controllers + mask branch
    exact_gelu: bool = True         # erf GELU (torch parity) vs tanh (serving)
    use_raft: bool = False          # RAFT convex upsampling of masks
    up_rate: int = 8                # RAFT upsample factor (ref: 8 // d_rate)
    remat: Any = False              # backbone block remat: False|True|"dw"
    dtype: Any = jnp.float32
    # interaction/embedding stages run fp32 by default, matching the
    # reference's autocast-off region (unicorn.py:491-504)
    interact_dtype: Any = jnp.float32

    def setup(self):
        self.backbone = YOLOPAFPN(
            depth=self.depth, width=self.width, in_channels=self.in_channels,
            act=self.act, backbone_name=self.backbone_name, dtype=self.dtype,
            exact_gelu=self.exact_gelu, remat=self.remat,
        )
        self.head = UnicornHead(
            num_classes=self.num_classes, width=self.width,
            in_channels=self.in_channels, act=self.act, sot_branch=True,
            use_attention=self.use_attention, n_layer_att=self.n_layer_att,
            unshared_obj=self.unshared_obj, unshared_reg=self.unshared_reg,
            fuse_method=self.fuse_method, learnable_fuse=self.learnable_fuse,
            exact_gelu=self.exact_gelu,
            with_mask=self.use_mask, dtype=self.dtype,
        )
        if self.use_mask:
            from .mask_head import MaskBranch

            self.mask_branch = MaskBranch(
                use_raft=self.use_raft, up_rate=self.up_rate,
                dtype=self.dtype,
            )
        idt = self.interact_dtype
        self.bottleneck = Bottleneck1x1(self.hidden_dim, dtype=idt)
        self.upsample = UpsampleEmbed(self.embed_dim, self.hidden_dim, dtype=idt)
        if self.interact_mode == "conv":
            self.pos_emb = None
            self.interaction = ConvInteraction(self.hidden_dim, dtype=idt)
        else:
            self.pos_emb = PositionEmbeddingLearned(
                self.hidden_dim // 2, sz=40, dtype=idt
            )
            if self.interact_mode == "full":
                self.interaction = FullAttentionInteraction(
                    self.hidden_dim, dtype=idt
                )
            elif self.interact_mode == "deform":
                self.interaction = DeformableInteraction(
                    self.hidden_dim, dtype=idt
                )
            else:
                raise ValueError(self.interact_mode)

    # ---- stage functions (reference unicorn.py:60-139 mode dispatch) ----

    def forward_backbone(self, imgs, run_fpn: bool = True):
        """imgs (B, H, W, 3) -> (fpn_outs, feat_s16).

        feat_s16 is the raw stride-16 backbone feature used for interaction
        (unicorn.py:231-258).
        """
        if run_fpn:
            fpn_outs, base_outs = self.backbone(imgs, return_base_feat=True)
            return fpn_outs, base_outs[1]
        base_outs = self.backbone(imgs, run_fpn=False)
        return base_outs[1]

    def forward_interaction(self, feat0, feat1):
        """Interact the two frames' stride-16 features (unicorn.py:260-309).

        feat0/feat1: (B, H16, W16, C_backbone) raw stride-16 features.
        Returns the refined (B, H16, W16, hidden_dim) pair.
        """
        b, h, w, _ = feat0.shape
        srcs = (self.bottleneck(feat0), self.bottleneck(feat1))
        if self.interact_mode == "conv":
            return self.interaction(srcs)
        pos = self.pos_emb(b, h, w)
        return self.interaction(srcs, (pos, pos))

    def forward_upsample(self, feat):
        """stride-16 -> stride-8 embedding map (unicorn.py:311-313)."""
        return self.upsample(feat)

    def forward_head(self, fpn_outs, priors):
        """Run the unified head. priors: per-level (B, H, W, 1) label maps."""
        return self.head(fpn_outs, priors)

    def forward_mask_branch(self, fpn_outs):
        """CondInst mask features (B, H8, W8, 8) + optional RAFT up-mask."""
        return self.mask_branch(fpn_outs)

    def forward_whole(self, imgs):
        """Detection-style forward for MOT inference (unicorn.py:133-139):
        backbone + head with zero priors. Returns (raw_head_outputs, feat_s16).
        """
        fpn_outs, feat_s16 = self.forward_backbone(imgs)
        b = imgs.shape[0]
        priors = tuple(
            jnp.zeros(f.shape[:3] + (1,), f.dtype) for f in fpn_outs
        )
        return self.head(fpn_outs, priors), feat_s16

    def __call__(self, imgs):
        """Default forward = forward_whole (for init)."""
        return self.forward_whole(imgs)

    def init_all(self, imgs):
        """Exercise every submodule so `model.init(..., method=Unicorn.init_all)`
        creates the full parameter tree (backbone + interaction + upsample +
        head with priors + mask branch)."""
        fpn_outs, feat_s16 = self.forward_backbone(imgs)
        f32 = feat_s16.astype(jnp.float32)
        new0, new1 = self.forward_interaction(f32, f32)
        emb = self.forward_upsample(new0)
        priors = tuple(jnp.zeros(f.shape[:3] + (1,), f.dtype) for f in fpn_outs)
        head_raw = self.head(fpn_outs, priors)
        if self.use_mask:
            head_raw = (head_raw, self.mask_branch(fpn_outs))
        return head_raw, emb


class YOLOXDet(nn.Module):
    """Detection/instance-seg pretraining model (reference yolox.py:16-80):
    PAFPN + det head (no SOT branch, no prior fusion)."""

    num_classes: int = 80
    depth: float = 1.0
    width: float = 1.0
    in_channels: Sequence[int] = (192, 384, 768)
    backbone_name: str = "convnext_tiny"
    act: str = "silu"
    use_attention: bool = False
    n_layer_att: int = 0
    use_mask: bool = False       # instance-seg stage (YOLOXMask, yolox.py:54-80)
    sem_loss_on: bool = False
    exact_gelu: bool = True
    remat: Any = False
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = YOLOPAFPN(
            depth=self.depth, width=self.width, in_channels=self.in_channels,
            act=self.act, backbone_name=self.backbone_name, dtype=self.dtype,
            exact_gelu=self.exact_gelu, remat=self.remat,
        )
        self.head = UnicornHead(
            num_classes=self.num_classes, width=self.width,
            in_channels=self.in_channels, act=self.act, sot_branch=False,
            use_attention=self.use_attention, n_layer_att=self.n_layer_att,
            with_mask=self.use_mask, dtype=self.dtype,
        )
        if self.use_mask:
            from .mask_head import MaskBranch

            self.mask_branch = MaskBranch(
                sem_loss_on=self.sem_loss_on, num_classes=self.num_classes,
                dtype=self.dtype,
            )

    def __call__(self, imgs):
        fpn_outs = self.backbone(imgs)
        head_raw = self.head(fpn_outs, None)
        if self.use_mask:
            return head_raw, self.mask_branch(fpn_outs)
        return head_raw
