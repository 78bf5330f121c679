"""VOS + MOTS training losses (the mask stage), static-shape TPU redesign.

Reference: unicorn/models/unicorn.py:339-390 (compute_loss_vos: per-matched-
instance propagation with mask init, per-instance head invocation, corr dice)
and the MOTS branch of compute_loss_mot with masks. Re-designs:

  * matched (frame0, frame1) instance pairs are packed into K static slots
    per sample (pair validity mask); all K priors propagate through ONE
    streaming correlation pass; the per-instance head calls fold the slot
    axis into the batch axis.
  * per-instance loss normalization matches the reference's average_dict
    (mean over matched instances of per-instance losses, unicorn.py:543-550),
    via a vmapped single-image loss.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.heads import decode_boxes, flatten_raw_outputs, level_grids
from ..ops.correlation import (
    box_label_map,
    dice_loss,
    resize_bilinear_torch,
)
from .det import simota_assign, iou_elementwise_cxcywh
import optax


def match_instance_pairs(targets, max_pairs: int):
    """targets (B, 2, M, 6) -> (idx0 (B, K), idx1 (B, K), valid (B, K)):
    first K (frame0, frame1) index pairs with equal nonzero track ids
    (the reference's nested matching loop, unicorn.py:349-365)."""
    tid0 = targets[:, 0, :, 5]
    tid1 = targets[:, 1, :, 5]
    match = (tid0[:, :, None] == tid1[:, None, :]) & \
        (tid0[:, :, None] != 0) & (tid1[:, None, :] != 0)  # (B, M, M)
    has = jnp.any(match, axis=2)                  # (B, M) row has a match
    j_first = jnp.argmax(match, axis=2)           # (B, M) first matching col
    # rank rows with matches; keep first K
    rank = jnp.cumsum(has.astype(jnp.int32), axis=1) - 1
    valid = has & (rank < max_pairs)
    M = targets.shape[2]
    B = targets.shape[0]
    idx0 = jnp.zeros((B, max_pairs), jnp.int32)
    idx1 = jnp.zeros((B, max_pairs), jnp.int32)
    pv = jnp.zeros((B, max_pairs), bool)
    rows = jnp.broadcast_to(jnp.arange(M)[None], (B, M))
    slot = jnp.where(valid, rank, max_pairs)      # overflow -> scratch
    b_idx = jnp.arange(B)[:, None]
    idx0 = jnp.zeros((B, max_pairs + 1), jnp.int32).at[b_idx, slot].set(rows)[:, :max_pairs]
    idx1 = jnp.zeros((B, max_pairs + 1), jnp.int32).at[b_idx, slot].set(j_first)[:, :max_pairs]
    pv = jnp.zeros((B, max_pairs + 1), bool).at[b_idx, slot].set(valid)[:, :max_pairs]
    return idx0, idx1, pv


def single_image_yolox_loss(labels, pred_boxes, obj_logits, cls_logits,
                            reg_raw, xs, ys, ss, img_size, use_l1,
                            reg_weight=5.0):
    """Per-image YOLOX loss (own num_fg normalization) for vmapping."""
    gt_valid = jnp.sum(labels, axis=1) > 0
    gt_boxes = labels[:, 1:5]
    gt_classes = labels[:, 0].astype(jnp.int32)
    assign = simota_assign(gt_boxes, gt_classes, gt_valid, pred_boxes,
                           obj_logits, cls_logits, xs, ys, ss, img_size)
    fg = assign.fg_mask.astype(jnp.float32)
    num_fg = jnp.maximum(assign.num_fg, 1.0)
    C = cls_logits.shape[-1]
    matched_cls = gt_classes[assign.matched_gt]
    reg_target = gt_boxes[assign.matched_gt]
    cls_target = jax.nn.one_hot(matched_cls, C) * assign.pred_iou[:, None]
    iou_ew = iou_elementwise_cxcywh(pred_boxes, reg_target)
    loss_iou = jnp.sum((1.0 - iou_ew ** 2) * fg) / num_fg
    loss_obj = jnp.sum(optax.sigmoid_binary_cross_entropy(
        obj_logits[:, 0], fg)) / num_fg
    loss_cls = jnp.sum(jnp.sum(optax.sigmoid_binary_cross_entropy(
        cls_logits, cls_target), -1) * fg) / num_fg
    if use_l1:
        eps = 1e-8
        l1_t = jnp.stack([
            reg_target[:, 0] / ss - xs, reg_target[:, 1] / ss - ys,
            jnp.log(reg_target[:, 2] / ss + eps),
            jnp.log(reg_target[:, 3] / ss + eps)], -1)
        loss_l1 = jnp.sum(jnp.abs(reg_raw - l1_t).sum(-1) * fg) / num_fg
    else:
        loss_l1 = 0.0
    total = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    return total, assign


def vos_loss(
    model, params, head_apply, mask_branch_apply,
    fpn_outs_1, embed_0, embed_1, targets, masks,
    img_size, max_pairs: int = 3, d_rate: int = 2, use_raft: bool = True,
    up_rate: int = 8, sample_mask=None, use_l1: bool = False,
    strides=(8, 16, 32), init_with_mask: bool = True,
):
    """VOS loss over K matched-instance slots.

    masks: (B, 2, M, Hm, Wm) instance masks at d_rate downsampling.
    head_apply(fpn_feats_folded, priors_folded) -> raw head outputs.
    Returns (loss_dict, per-slot diagnostics).
    """
    B, _, M, Hm, Wm = masks.shape
    H, W = img_size
    H8, W8 = H // 8, W // 8
    K = max_pairs
    N = H8 * W8

    idx0, idx1, pv = match_instance_pairs(targets, K)
    b_idx = jnp.arange(B)[:, None]

    # frame-0 per-slot label maps at stride 8
    if init_with_mask:
        m0 = masks[b_idx, 0, idx0]          # (B, K, Hm, Wm)
        lbs0 = jax.image.resize(m0, (B, K, H8, W8), "bilinear")
    else:
        boxes0 = targets[b_idx, 0, idx0, 1:5]  # (B, K, 4)
        lbs0 = jax.vmap(lambda bx: resize_bilinear_torch(
            box_label_map(bx, H, W)[..., None], H8, W8)[..., 0])(boxes0)
    # propagate all K slots in one pass
    C = embed_0.shape[-1]
    from ..ops.pallas_correlation import correlation_propagate_train

    pred = correlation_propagate_train(
        embed_0.reshape(B, N, C).astype(jnp.float32),
        embed_1.reshape(B, N, C).astype(jnp.float32),
        lbs0.reshape(B, K, N),
    ).reshape(B, K, H8, W8)

    # fold slots into batch for the head call
    priors_s8 = pred.reshape(B * K, H8, W8, 1)
    priors = (
        priors_s8,
        resize_bilinear_torch(priors_s8, H8 // 2, W8 // 2),
        resize_bilinear_torch(priors_s8, H8 // 4, W8 // 4),
    )
    fpn_folded = tuple(
        jnp.repeat(f, K, axis=0) for f in fpn_outs_1
    )
    priors = tuple(p.astype(f.dtype) for p, f in zip(priors, fpn_folded))
    raw = head_apply(fpn_folded, priors)
    flat = flatten_raw_outputs(raw, "sot")
    hw = flat["hw"]
    xs, ys, ss = level_grids(hw, strides)
    boxes_dec = decode_boxes(flat["reg_raw"], hw, strides)  # (B*K, A, 4)

    # per-slot single-instance labels from frame 1
    labels1 = jnp.zeros((B, K, 1, 5))
    labels1 = labels1.at[..., 0, 1:5].set(targets[b_idx, 1, idx1, 1:5])
    labels_f = labels1.reshape(B * K, 1, 5)

    per_total, assign = jax.vmap(
        lambda lab, pb, ol, cl, rr: single_image_yolox_loss(
            lab, pb, ol, cl, rr, xs, ys, ss, img_size, use_l1)
    )(labels_f, boxes_dec, flat["obj_logits"], flat["cls_logits"],
      flat["reg_raw"])

    # correlation dice per slot (pred vs frame-1 instance map)
    if init_with_mask:
        gt1 = jax.image.resize(masks[b_idx, 1, idx1], (B, K, H8, W8), "bilinear")
    else:
        boxes1 = targets[b_idx, 1, idx1, 1:5]
        gt1 = jax.vmap(lambda bx: resize_bilinear_torch(
            box_label_map(bx, H, W)[..., None], H8, W8)[..., 0])(boxes1)
    corr_d = jax.vmap(jax.vmap(
        lambda p, g: dice_loss(p[None], g[None])
    ))(pred, gt1)  # (B, K)

    # CondInst mask loss for the slot instance
    mask_feats, up_mask, _ = mask_branch_apply(fpn_folded)
    gtm1 = masks[b_idx, 1, idx1].reshape(B * K, 1, Hm, Wm)
    from .mask import condinst_mask_loss

    slot_w = pv.astype(jnp.float32)
    if sample_mask is not None:
        slot_w = slot_w * sample_mask[:, None]
    slot_w_f = slot_w.reshape(B * K)
    mask_l = condinst_mask_loss(
        flat["ctrl"], mask_feats,
        assign.fg_mask, assign.matched_gt, assign.pred_iou,
        gtm1, hw, strides, max_inst=8,
        up_masks=None if up_mask is None else up_mask,
        up_rate=up_rate, sample_mask=slot_w_f,
    )

    n_slots = jnp.maximum(jnp.sum(slot_w), 1.0)
    total = jnp.sum((per_total.reshape(B, K) + corr_d) * slot_w) / n_slots \
        + mask_l
    return {
        "total_loss": total,
        "vos_head_loss": jnp.sum(per_total.reshape(B, K) * slot_w) / n_slots,
        "corr_loss": jnp.sum(corr_d * slot_w) / n_slots,
        "condinst_loss": mask_l,
    }
