"""SimOTA label assignment + YOLOX detection losses, fully static-shape.

Re-architecture of the reference per-image Python-loop implementation
(unicorn/models/unicorn_head.py:484-919) into batched masked jax:

  * gts are padded to a fixed M with a validity mask; anchors A are static.
  * the (M, A, C) BCE cls-cost tensor never materializes: with p the
    sqrt(cls_sig * obj_sig) scores and c_m the gt class,
        sum_c BCE(p_c, onehot_c) = -log(p_{c_m}) + log(1 - p_{c_m}) + S(a)
    where S(a) = -sum_c log(1 - p_c(a)) is gt-independent. Only (M, A)
    matrices are needed — no OOM-retry path (unicorn_head.py:543-595) needed.
  * dynamic-k selection is a masked top-10 (k is provably <= 10 since it is
    int(sum of top-10 ious) <= 10), so shapes stay static.

All functions operate on one image and are vmapped over the batch.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BIG_COST = 1e9
CENTER_RADIUS = 2.5
N_CANDIDATE_K = 10


def iou_pairwise_cxcywh(gt, pred):
    """IoU matrix between gt (M,4) and pred (A,4), both cxcywh.

    Mirrors `bboxes_iou(..., xyxy=False)` (unicorn/utils/boxes.py:155-180).
    """
    tl = jnp.maximum(gt[:, None, :2] - gt[:, None, 2:4] / 2,
                     pred[None, :, :2] - pred[None, :, 2:4] / 2)
    br = jnp.minimum(gt[:, None, :2] + gt[:, None, 2:4] / 2,
                     pred[None, :, :2] + pred[None, :, 2:4] / 2)
    area_g = jnp.prod(gt[:, 2:4], axis=1)
    area_p = jnp.prod(pred[:, 2:4], axis=1)
    en = jnp.all(tl < br, axis=2)
    area_i = jnp.prod(br - tl, axis=2) * en
    return area_i / (area_g[:, None] + area_p[None, :] - area_i + 1e-16)


def iou_elementwise_cxcywh(pred, target):
    """Element-wise IoU of aligned boxes (N,4) cxcywh (models/losses.py:9-53)."""
    tl = jnp.maximum(pred[:, :2] - pred[:, 2:] / 2, target[:, :2] - target[:, 2:] / 2)
    br = jnp.minimum(pred[:, :2] + pred[:, 2:] / 2, target[:, :2] + target[:, 2:] / 2)
    area_p = jnp.prod(pred[:, 2:], axis=1)
    area_g = jnp.prod(target[:, 2:], axis=1)
    en = jnp.all(tl < br, axis=1)
    area_i = jnp.prod(br - tl, axis=1) * en
    return area_i / (area_p + area_g - area_i + 1e-16)


class OTAResult(NamedTuple):
    fg_mask: jnp.ndarray          # (A,) bool — assigned anchors
    matched_gt: jnp.ndarray       # (A,) int32 — gt index per anchor (0 if bg)
    pred_iou: jnp.ndarray         # (A,) float — IoU with matched gt (0 if bg)
    num_fg: jnp.ndarray           # () float
    num_gt: jnp.ndarray           # () float


def get_geometry_constraints(gt_boxes, gt_valid, x_shifts, y_shifts, strides, img_size):
    """in-box / in-center masks (unicorn_head.py:795-888).

    gt_boxes: (M,4) cxcywh; gt_valid: (M,) bool; shifts/strides: (A,)
    Returns is_in_boxes (M,A), is_in_centers (M,A), fg_candidate (A,).
    """
    xc = (x_shifts + 0.5) * strides  # (A,)
    yc = (y_shifts + 0.5) * strides

    gl = gt_boxes[:, 0] - 0.5 * gt_boxes[:, 2]
    gr = gt_boxes[:, 0] + 0.5 * gt_boxes[:, 2]
    gt_ = gt_boxes[:, 1] - 0.5 * gt_boxes[:, 3]
    gb = gt_boxes[:, 1] + 0.5 * gt_boxes[:, 3]
    in_boxes = (
        (xc[None, :] > gl[:, None]) & (xc[None, :] < gr[:, None])
        & (yc[None, :] > gt_[:, None]) & (yc[None, :] < gb[:, None])
    )

    cx = jnp.clip(gt_boxes[:, 0], 0.0, img_size[1])
    cy = jnp.clip(gt_boxes[:, 1], 0.0, img_size[0])
    r = CENTER_RADIUS * strides  # (A,)
    in_centers = (
        (xc[None, :] > cx[:, None] - r[None, :]) & (xc[None, :] < cx[:, None] + r[None, :])
        & (yc[None, :] > cy[:, None] - r[None, :]) & (yc[None, :] < cy[:, None] + r[None, :])
    )

    in_boxes = in_boxes & gt_valid[:, None]
    in_centers = in_centers & gt_valid[:, None]
    fg_candidate = jnp.any(in_boxes | in_centers, axis=0)
    return in_boxes, in_centers, fg_candidate


def simota_assign(
    gt_boxes, gt_classes, gt_valid,
    pred_boxes, obj_logits, cls_logits,
    x_shifts, y_shifts, strides, img_size,
) -> OTAResult:
    """Single-image SimOTA (unicorn_head.py:690-919), static shapes.

    gt_boxes (M,4) cxcywh; gt_classes (M,) int; gt_valid (M,) bool
    pred_boxes (A,4) decoded cxcywh; obj_logits (A,1); cls_logits (A,C)
    """
    in_boxes, in_centers, fg_cand = get_geometry_constraints(
        gt_boxes, gt_valid, x_shifts, y_shifts, strides, img_size
    )
    in_boxes_and_center = in_boxes & in_centers  # (M, A)

    iou = iou_pairwise_cxcywh(gt_boxes, pred_boxes)  # (M, A)
    iou = iou * gt_valid[:, None] * fg_cand[None, :]

    # cls cost, factorized: p = sqrt(cls_sig * obj_sig)  (A, C)
    p = jnp.sqrt(jax.nn.sigmoid(cls_logits) * jax.nn.sigmoid(obj_logits))
    p = jnp.clip(p, 1e-8, 1.0 - 1e-8)
    log_p = jnp.log(p)
    log_1mp = jnp.log1p(-p)
    s_all = -jnp.sum(log_1mp, axis=-1)  # (A,)
    gt_cls = jnp.clip(gt_classes.astype(jnp.int32), 0, cls_logits.shape[-1] - 1)
    p_gt_log = log_p[:, gt_cls].T        # (M, A)
    p_gt_log1m = log_1mp[:, gt_cls].T    # (M, A)
    cls_cost = -p_gt_log + p_gt_log1m + s_all[None, :]

    iou_cost = -jnp.log(iou + 1e-8)
    cost = cls_cost + 3.0 * iou_cost + 1e5 * (~in_boxes_and_center)
    # exclude non-candidate anchors / invalid gts entirely
    cost = jnp.where(fg_cand[None, :] & gt_valid[:, None], cost, BIG_COST)

    # dynamic-k: k_m = clamp(int(sum top-10 iou), 1) <= 10
    topk_ious, _ = jax.lax.top_k(iou, N_CANDIDATE_K)  # (M, 10)
    dynamic_ks = jnp.clip(jnp.sum(topk_ious, axis=1).astype(jnp.int32), 1, None)  # (M,)

    # per-gt: pick dynamic_k lowest-cost anchors out of top-10
    neg_cost_top, top_idx = jax.lax.top_k(-cost, N_CANDIDATE_K)  # (M, 10)
    rank = jnp.arange(N_CANDIDATE_K)[None, :]
    sel = (rank < dynamic_ks[:, None]) & gt_valid[:, None]  # (M, 10)
    M, A = cost.shape
    matching = jnp.zeros((M, A), jnp.float32)
    matching = matching.at[jnp.arange(M)[:, None], top_idx].set(sel.astype(jnp.float32))

    # conflict resolution: anchor claimed by >1 gt goes to the min-cost gt
    # (over ALL gt rows, matching the reference's argmin over the full cost
    # column, unicorn_head.py:905-908)
    anchor_deg = jnp.sum(matching, axis=0)  # (A,)
    best_gt = jnp.argmin(cost, axis=0)      # (A,)
    onehot_best = jax.nn.one_hot(best_gt, M, axis=0)  # (M, A)
    matching = jnp.where(anchor_deg[None, :] > 1, onehot_best, matching)

    fg_mask = jnp.sum(matching, axis=0) > 0
    matched_gt = jnp.argmax(matching, axis=0).astype(jnp.int32)
    pred_iou = jnp.sum(matching * iou, axis=0)
    num_fg = jnp.sum(fg_mask.astype(jnp.float32))
    num_gt = jnp.sum(gt_valid.astype(jnp.float32))
    # The reference computes the whole assignment under @torch.no_grad()
    # (unicorn_head.py:690) — pred_iou feeds cls_target as a CONSTANT. Without
    # this stop, grad would flow through the (M, A) pairwise-IoU tower via the
    # BCE target derivative (a semantic difference AND dead bwd compute).
    return jax.tree_util.tree_map(jax.lax.stop_gradient,
                                  OTAResult(fg_mask, matched_gt, pred_iou,
                                            num_fg, num_gt))


def yolox_losses(
    labels,              # (B, M, 5) [cls, cx, cy, w, h] zero-padded
    pred_boxes,          # (B, A, 4) decoded cxcywh
    obj_logits,          # (B, A, 1)
    cls_logits,          # (B, A, C)
    reg_raw,             # (B, A, 4) raw reg (for L1)
    x_shifts, y_shifts, strides_vec,
    img_size,
    use_l1: bool = False,
    reg_weight: float = 5.0,
    sample_mask=None,    # optional (B,) weights selecting the task sub-batch
):
    """Batched YOLOX losses with SimOTA assignment (unicorn_head.py:484-688).

    With `sample_mask` the losses equal the reference's computation on the
    masked sub-batch (sums and num_fg are restricted to masked samples) —
    this statically replaces the reference's boolean-index batch split
    (unicorn/models/unicorn.py:92-103).

    Returns (loss_dict, aux) where loss_dict has total/iou/obj/cls/l1 losses
    and num_fg stats. aux carries per-anchor assignment for downstream heads
    (CondInst mask loss needs matched_gt + fg_mask).
    """
    # invalid rows are all-zero (reference: nlabel = (labels.sum(2) > 0))
    gt_valid = jnp.sum(labels, axis=2) > 0  # (B, M)
    gt_boxes = labels[..., 1:5]
    gt_classes = labels[..., 0].astype(jnp.int32)

    assign = jax.vmap(
        lambda gb, gc, gv, pb, ol, cl: simota_assign(
            gb, gc, gv, pb, ol, cl, x_shifts, y_shifts, strides_vec, img_size
        )
    )(gt_boxes, gt_classes, gt_valid, pred_boxes, obj_logits, cls_logits)

    fg = assign.fg_mask.astype(jnp.float32)  # (B, A)
    if sample_mask is None:
        sample_mask = jnp.ones((fg.shape[0],), jnp.float32)
    sample_mask = sample_mask.astype(jnp.float32)
    fg = fg * sample_mask[:, None]
    num_fg = jnp.maximum(jnp.sum(assign.num_fg * sample_mask), 1.0)
    num_gts = jnp.maximum(jnp.sum(assign.num_gt * sample_mask), 1.0)

    B, A = fg.shape
    C = cls_logits.shape[-1]
    batch_idx = jnp.arange(B)[:, None]
    matched_cls = gt_classes[batch_idx, assign.matched_gt]           # (B, A)
    reg_target = gt_boxes[batch_idx, assign.matched_gt]              # (B, A, 4)
    cls_target = jax.nn.one_hot(matched_cls, C) * assign.pred_iou[..., None]

    # IoU loss (squared-iou form, models/losses.py:36)
    iou_ew = jax.vmap(iou_elementwise_cxcywh)(pred_boxes, reg_target)  # (B, A)
    loss_iou = jnp.sum((1.0 - iou_ew ** 2) * fg) / num_fg

    loss_obj = jnp.sum(
        optax.sigmoid_binary_cross_entropy(obj_logits[..., 0], fg)
        * sample_mask[:, None]
    ) / num_fg
    loss_cls = jnp.sum(
        jnp.sum(optax.sigmoid_binary_cross_entropy(cls_logits, cls_target), axis=-1) * fg
    ) / num_fg

    if use_l1:
        # l1 targets in grid coords (unicorn_head.py:684-689)
        eps = 1e-8
        tx = reg_target[..., 0] / strides_vec - x_shifts
        ty = reg_target[..., 1] / strides_vec - y_shifts
        tw = jnp.log(reg_target[..., 2] / strides_vec + eps)
        th = jnp.log(reg_target[..., 3] / strides_vec + eps)
        l1_t = jnp.stack([tx, ty, tw, th], axis=-1)
        loss_l1 = jnp.sum(jnp.abs(reg_raw - l1_t).sum(-1) * fg) / num_fg
    else:
        loss_l1 = jnp.asarray(0.0)

    total = reg_weight * loss_iou + loss_obj + loss_cls + loss_l1
    loss_dict = {
        "total_loss": total,
        "iou_loss": reg_weight * loss_iou,
        "conf_loss": loss_obj,
        "cls_loss": loss_cls,
        "l1_loss": loss_l1,
        "num_fg": num_fg / num_gts,
    }
    return loss_dict, assign
