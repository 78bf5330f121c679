"""CondInst mask loss with a fixed per-image instance budget.

Reference: unicorn/models/unicorn_head_mask.py (mask loss over OTA-matched
anchors) + condinst/dynamic_mask_head.py:50-58 (per-instance dice). TPU
re-design: instead of a dynamic number of matched anchors, each image
contributes a static budget of K anchor slots, chosen as the top-K assigned
anchors by matched IoU (validity-masked). Dynamic convs run as batched
matmuls (ops/dynamic_conv.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.mask_head import anchor_locations_and_levels
from ..ops.dynamic_conv import (
    aligned_bilinear,
    convex_upsample,
    dynamic_mask_logits,
)


def dice_per_instance(scores, targets):
    """(N, H, W) sigmoid scores vs binary targets -> (N,) dice loss
    (dynamic_mask_head.py:50-58)."""
    eps = 1e-5
    x = scores.reshape(scores.shape[0], -1)
    t = targets.reshape(targets.shape[0], -1)
    inter = jnp.sum(x * t, axis=1)
    union = jnp.sum(x ** 2, axis=1) + jnp.sum(t ** 2, axis=1) + eps
    return 1.0 - 2.0 * inter / union


def select_topk_mask_logits(ctrl_i, mf_i, fg_i, piou_i, locs, lvls,
                            max_inst, upm_i, up_rate, Hm, Wm):
    """Shared CondInst slot machinery (single image): top-K fg anchors by
    matched IoU (+1 so iou=0 fg still beats bg), dynamic-conv mask decode,
    RAFT/bilinear upsample, and a resize fallback to the target mask grid.
    Used by both the fully-supervised dice loss below and the BoxInst
    box-supervised loss (losses/boxinst.py) so slot selection cannot drift.

    Returns (valid (K,) bool, topi (K,) int anchor idx, logits (K, Hm, Wm)).
    """
    score = jnp.where(fg_i, piou_i + 1.0, 0.0)
    topv, topi = jax.lax.top_k(score, max_inst)
    valid = topv > 0.0
    logits = dynamic_mask_logits(mf_i, ctrl_i[topi], locs[topi], lvls[topi])
    if upm_i is not None:
        logits = convex_upsample(logits, upm_i, up_rate)
    else:
        logits = aligned_bilinear(logits, 2)        # stride 8 -> 4
    if logits.shape[1:] != (Hm, Wm):
        logits = jax.image.resize(logits, (max_inst, Hm, Wm), "bilinear")
    return valid, topi, logits


def condinst_mask_loss(
    ctrl,            # (B, A, 169) controller outputs
    mask_feats,      # (B, H8, W8, 8)
    fg_mask,         # (B, A) bool — SimOTA assignment
    matched_gt,      # (B, A) int
    pred_iou,        # (B, A) float — for top-K slot selection
    gt_masks,        # (B, M, Hm, Wm) binary instance masks (d_rate-downsampled)
    hw_list, strides,
    max_inst: int = 48,
    up_masks=None,   # (B, H8, W8, 9*R^2) when use_raft
    up_rate: int = 8,
    sample_mask=None,
):
    """Returns scalar mask dice loss averaged over selected instances."""
    B, A = fg_mask.shape
    locs, lvls = anchor_locations_and_levels(hw_list, strides)  # (A,2),(A,)
    Hm, Wm = gt_masks.shape[2:]

    def per_image(ctrl_i, mf_i, fg_i, mgt_i, piou_i, gtm_i, upm_i):
        valid, topi, logits = select_topk_mask_logits(
            ctrl_i, mf_i, fg_i, piou_i, locs, lvls, max_inst, upm_i,
            up_rate, Hm, Wm)
        scores = jax.nn.sigmoid(logits)
        tgts = gtm_i[mgt_i[topi]]                   # (K, Hm, Wm)
        d = dice_per_instance(scores, tgts)
        return jnp.sum(d * valid), jnp.sum(valid.astype(jnp.float32))

    if up_masks is None:
        losses, counts = jax.vmap(
            lambda c, m, f, g, p, t: per_image(c, m, f, g, p, t, None)
        )(ctrl, mask_feats, fg_mask, matched_gt, pred_iou, gt_masks)
    else:
        losses, counts = jax.vmap(per_image)(
            ctrl, mask_feats, fg_mask, matched_gt, pred_iou, gt_masks, up_masks
        )
    if sample_mask is not None:
        losses = losses * sample_mask
        counts = counts * sample_mask
    return jnp.sum(losses) / jnp.maximum(jnp.sum(counts), 1.0)


def semantic_focal_loss(sem_logits, gt_masks, gt_classes, gt_valid,
                        num_classes: int, alpha: float = 0.25,
                        gamma: float = 2.0):
    """Auxiliary semantic segmentation focal loss (mask_branch.py:98-162):
    per-pixel class targets from the union of instance masks."""
    B, H, W, C = sem_logits.shape
    # build per-class target maps by max-pooling instance masks per class
    masks = jax.image.resize(gt_masks, (B, gt_masks.shape[1], H, W), "bilinear")
    masks = (masks > 0.5).astype(jnp.float32) * gt_valid[..., None, None]
    onehot = jax.nn.one_hot(gt_classes, C)          # (B, M, C)
    target = jnp.einsum("bmhw,bmc->bhwc", masks, onehot)
    target = jnp.clip(target, 0.0, 1.0)
    p = jax.nn.sigmoid(sem_logits)
    ce = -(target * jnp.log(p + 1e-8) + (1 - target) * jnp.log(1 - p + 1e-8))
    p_t = p * target + (1 - p) * (1 - target)
    loss = ce * ((1 - p_t) ** gamma)
    loss = loss * (alpha * target + (1 - alpha) * (1 - target))
    num_pos = jnp.maximum(jnp.sum(target), 1.0)
    return jnp.sum(loss) / num_pos
