"""Unified SOT+MOT training losses, static-shape TPU redesign.

Reference: unicorn/models/unicorn.py:315-466 (compute_loss_sot / mot /
mot_corr) and the task dispatch at unicorn.py:76-132. Key re-designs:

  * the per-sample boolean batch split becomes sample-mask weighting: the SOT
    and MOT losses are both computed over the full batch and weighted by task
    masks. Batches are task-homogeneous under alternating training
    (OmniDatasetPlus.alter_task), so no compute is duplicated in practice for
    the head; correlation propagation is masked per-sample.
  * the head runs ONCE with per-sample priors (propagated label map for SOT
    samples, zeros for MOT samples) — valid because prior fusion is per-sample
    elementwise, so a zero prior is identical to the reference's zero-mask head
    call for MOT (unicorn.py:392-404).
  * MOT contrastive correlation loss: static (M, M) similarity with validity
    masking replacing the per-instance Python loops (unicorn.py:413-459).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.heads import decode_boxes, flatten_raw_outputs, level_grids
from ..ops.correlation import (
    box_label_map,
    dice_loss,
    grid_sample_at_points,
    resize_bilinear_torch,
)
from .det import yolox_losses


def sample_instance_embeddings(embed, centers_xy, stride: float = 8.0):
    """Pull per-instance embeddings at box centers via bilinear sampling.

    embed: (H_d, W_d, C); centers_xy: (M, 2) image coords.
    Exactly reproduces the reference's grid_sample coordinate chain
    (unicorn.py:437-448): c = clamp(cxy/s - 0.5, 0, D-1), then
    align_corners=False grid mapping => pixel = c * D/(D-1) - 0.5.
    """
    H_d, W_d, _ = embed.shape
    cx = jnp.clip(centers_xy[:, 0] / stride - 0.5, 0.0, W_d - 1.0)
    cy = jnp.clip(centers_xy[:, 1] / stride - 0.5, 0.0, H_d - 1.0)
    px = cx * W_d / (W_d - 1) - 0.5
    py = cy * H_d / (H_d - 1) - 0.5
    return grid_sample_at_points(embed, jnp.stack([px, py], -1))


def _masked_ce(logits, labels, row_valid, col_valid):
    """Cross-entropy over rows of `logits` restricted to valid columns,
    averaged over valid rows (torch CE ignore_index semantics)."""
    neg = jnp.asarray(-1e9, logits.dtype)
    masked = jnp.where(col_valid[None, :], logits, neg)
    logz = jax.nn.logsumexp(masked, axis=1)
    picked = jnp.take_along_axis(masked, labels[:, None], axis=1)[:, 0]
    ce = logz - picked
    cnt = jnp.maximum(jnp.sum(row_valid.astype(jnp.float32)), 1.0)
    return jnp.sum(ce * row_valid) / cnt


def mot_contrastive_loss_single(embed0, embed1, targets, bidirect: bool = True):
    """Contrastive embedding loss for one image pair (unicorn.py:409-459).

    embed0/embed1: (H_d, W_d, C); targets: (2, M, 6) [cls,cx,cy,w,h,tid].
    """
    tid0 = targets[0, :, 5]
    tid1 = targets[1, :, 5]
    v0 = tid0 != 0
    v1 = tid1 != 0

    e0 = sample_instance_embeddings(embed0, targets[0, :, 1:3])  # (M, C)
    e1 = sample_instance_embeddings(embed1, targets[1, :, 1:3])
    sim = e0 @ e1.T  # (M, M)

    match = (tid0[:, None] == tid1[None, :]) & v0[:, None] & v1[None, :]
    row_has = jnp.any(match, axis=1)
    col_has = jnp.any(match, axis=0)
    row_label = jnp.argmax(match, axis=1).astype(jnp.int32)
    col_label = jnp.argmax(match, axis=0).astype(jnp.int32)

    loss_row = _masked_ce(sim, row_label, row_has, v1)
    if not bidirect:
        return loss_row
    loss_col = _masked_ce(sim.T, col_label, col_has, v0)
    return 0.5 * (loss_row + loss_col)


def build_mhs_labels(targets):
    """MOT-helps-SOT: pick the FIRST track-id-matched instance pair of each
    sample and make a single-instance SOT label pair out of it
    (reference's nested matching loop, unicorn.py:104-119).

    targets (B, 2, M, 6) -> (mhs_targets (B, 2, M, 6) with one instance,
    has_pair (B,) bool)."""
    from .vos import match_instance_pairs

    idx0, idx1, pv = match_instance_pairs(targets, 1)
    b_idx = jnp.arange(targets.shape[0])
    out = jnp.zeros_like(targets)
    out = out.at[:, 0, 0, 1:6].set(targets[b_idx, 0, idx0[:, 0], 1:6])
    out = out.at[:, 1, 0, 1:6].set(targets[b_idx, 1, idx1[:, 0], 1:6])
    has = pv[:, 0]
    return out * has[:, None, None, None], has


def unicorn_uni_loss(
    head_raw,            # per-level raw head outputs (both branches)
    embed_0, embed_1,    # (B, H8, W8, C) stride-8 embedding maps
    pred_prior_s8,       # (B, H8, W8, 1) propagated label map (pre-masked)
    gt_lbs1_s8,          # (B, H8, W8, 1) frame-1 gt label map at stride 8
    targets,             # (B, 2, M, 6)
    task_ids,            # (B,) 1=SOT/VOS, 2=MOT/MOTS
    img_size,            # (H, W) static
    strides=(8, 16, 32),
    num_classes: int = 8,
    mot_weight: float = 1.0,
    sot_weight: float = 1.0,
    bidirect: bool = True,
    use_l1: bool = False,
    sot_only: bool = False,
):
    """Combined loss (unicorn.py:76-132). Returns a loss dict.

    sot_only=True skips the MOT branch entirely (head losses + contrastive):
    callers whose task_ids can never be 2 (the MHS auxiliary pass feeds
    tasks in {0, 1}) would otherwise pay a full SimOTA/MOT-loss computation
    that is multiplied by an exactly-zero sample count — same value and
    gradients, none of the work."""
    B = targets.shape[0]
    sot_mask = (task_ids == 1).astype(jnp.float32)
    mot_mask = (task_ids == 2).astype(jnp.float32)

    # --- head losses for both tasks (one head call already done upstream) ---
    hw = [(img_size[0] // s, img_size[1] // s) for s in strides]
    xs, ys, ss = level_grids(hw, strides)

    def head_losses(mode, labels5, mask):
        flat = flatten_raw_outputs(head_raw, mode)
        boxes = decode_boxes(flat["reg_raw"], flat["hw"], strides)
        return yolox_losses(
            labels5, boxes, flat["obj_logits"], flat["cls_logits"],
            flat["reg_raw"], xs, ys, ss, img_size,
            use_l1=use_l1, sample_mask=mask,
        )

    labels1 = targets[:, 1]  # current frame (B, M, 6)
    sot_dict, _ = head_losses("sot", labels1[..., :5], sot_mask)

    # --- correlation losses ---
    corr_sot = dice_loss(
        pred_prior_s8[..., 0], gt_lbs1_s8[..., 0], sample_mask=sot_mask
    )
    total_sot = (sot_dict["total_loss"] + corr_sot) * sot_weight
    n_sot_f = jnp.sum(sot_mask)

    if sot_only:
        out = {"total_loss": n_sot_f * total_sot / B,
               "corr_loss_sot": corr_sot}
        for k, v in sot_dict.items():
            if k != "total_loss":
                out[k + "_sot"] = v
        return out

    mot_dict, _ = head_losses("mot", labels1[..., :5], mot_mask)
    corr_mot_b = jax.vmap(
        lambda e0, e1, t: mot_contrastive_loss_single(e0, e1, t, bidirect)
    )(embed_0, embed_1, targets)
    n_mot = jnp.maximum(jnp.sum(mot_mask), 1.0)
    corr_mot = jnp.sum(corr_mot_b * mot_mask) / n_mot

    total_mot = mot_dict["total_loss"] + corr_mot
    if mot_weight > 1.0:
        # reference adds extra conf-loss weight for MOT (unicorn_head.py:393-396)
        total_mot = total_mot + mot_dict["conf_loss"] * (mot_weight - 1.0)

    n_mot_f = jnp.sum(mot_mask)
    total = (n_sot_f * total_sot + n_mot_f * total_mot) / B

    out = {"total_loss": total, "corr_loss_sot": corr_sot, "corr_loss_mot": corr_mot}
    for k, v in sot_dict.items():
        if k != "total_loss":
            out[k + "_sot"] = v
    for k, v in mot_dict.items():
        if k != "total_loss":
            out[k + "_mot"] = v
    return out


def build_sot_priors(embed_0, embed_1, targets, img_size, task_ids=None,
                     chunk: int = 1024):
    """Propagate the frame-0 target box label map to frame 1 (unicorn.py:319-327).

    Returns (pred_prior_s8 (B, H8, W8, 1), gt_lbs1_s8 (B, H8, W8, 1)).
    The propagated prior is zeroed for non-SOT samples (so the single head call
    sees zero priors for MOT samples).
    """
    B, H8, W8, C = embed_0.shape
    H, W = img_size
    N = H8 * W8

    lbs0_full = box_label_map(targets[:, 0, 0, 1:5], H, W)[..., None]  # (B,H,W,1)
    lbs0 = resize_bilinear_torch(lbs0_full, H8, W8)  # (B,H8,W8,1)
    gt1_full = box_label_map(targets[:, 1, 0, 1:5], H, W)[..., None]
    gt1 = resize_bilinear_torch(gt1_full, H8, W8)

    from ..ops.pallas_correlation import correlation_propagate_train

    e0 = embed_0.reshape(B, N, C).astype(jnp.float32)
    e1 = embed_1.reshape(B, N, C).astype(jnp.float32)
    pred = correlation_propagate_train(e0, e1, lbs0.reshape(B, 1, N))
    pred = pred.reshape(B, H8, W8, 1)
    if task_ids is not None:
        pred = pred * (task_ids == 1).astype(pred.dtype)[:, None, None, None]
    return pred, gt1
