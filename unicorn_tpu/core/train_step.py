"""Jitted train-step factories for the det and uni stages.

The uni step reimplements UnicornActor (reference unicorn/models/unicorn.py:
470-507): stack the 2 frames into one 2B batch through the backbone, run
fp32 interaction + upsample, build SOT priors via correlation propagation,
one unified head call, masked task losses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..losses.det import yolox_losses
from ..losses.uni import build_sot_priors, unicorn_uni_loss
from ..models.heads import decode_boxes, flatten_raw_outputs, level_grids
from ..models.unicorn import Unicorn
from ..ops.correlation import resize_bilinear_torch


def det_loss_fn(model, params, images, labels, img_size, use_l1=False,
                strides=(8, 16, 32)):
    """Detection pretraining loss (reference trainer.py:171-234 path)."""
    head_raw = model.apply(params, images)
    flat = flatten_raw_outputs(head_raw, "mot")
    boxes = decode_boxes(flat["reg_raw"], flat["hw"], strides)
    xs, ys, ss = level_grids(flat["hw"], strides)
    loss_dict, _ = yolox_losses(
        labels, boxes, flat["obj_logits"], flat["cls_logits"], flat["reg_raw"],
        xs, ys, ss, img_size, use_l1=use_l1,
    )
    return loss_dict["total_loss"], loss_dict


def uni_forward_embeddings(model: Unicorn, params, images, backbone_map=False):
    """Backbone + interaction + upsample for a 2-frame batch.

    images: (B, 2, H, W, 3). Returns (fpn_outs_1, embed_0, embed_1).
    Matches UnicornActor: both frames share one backbone pass as a 2B batch
    (frame-major concat, unicorn.py:491-495).

    backbone_map=True runs the backbone as a lax.map over the 2B frames
    (batch-1 per iteration) instead of one 2B batch — same math, smaller
    live activation set per step (the measured batch>1 whole-graph
    scheduling regression, BASELINE.md batch_stage/head_bisect; probe via
    train_profile.py TP_MAP_BB=1).
    """
    B, nF, H, W, _ = images.shape
    assert nF == 2
    imgs_flat = images.transpose(1, 0, 2, 3, 4).reshape(2 * B, H, W, 3)
    if backbone_map:
        def _bb_one(img):
            fpn, f16 = model.apply(params, img[None],
                                   method=Unicorn.forward_backbone)
            return tuple(x[0] for x in fpn), f16[0]

        fpn_outs, feat16 = jax.lax.map(_bb_one, imgs_flat)
    else:
        fpn_outs, feat16 = model.apply(params, imgs_flat, method=Unicorn.forward_backbone)
    fpn_outs_1 = tuple(x[B:] for x in fpn_outs)
    feat0 = feat16[:B].astype(jnp.float32)
    feat1 = feat16[B:].astype(jnp.float32)
    new0, new1 = model.apply(params, feat0, feat1, method=Unicorn.forward_interaction)
    embed_0 = model.apply(params, new0, method=Unicorn.forward_upsample)
    embed_1 = model.apply(params, new1, method=Unicorn.forward_upsample)
    return fpn_outs_1, embed_0, embed_1


def uni_loss_fn(model: Unicorn, params, images, targets, task_ids, img_size,
                mot_weight=1.0, sot_weight=1.0, bidirect=True, use_l1=False,
                num_classes=8, mhs=False, mhs_weight=0.5, backbone_map=False):
    """Full unified SOT+MOT loss for a (B, 2, ...) batch."""
    fpn_outs_1, embed_0, embed_1 = uni_forward_embeddings(
        model, params, images, backbone_map=backbone_map)
    pred_prior, gt_lbs1 = build_sot_priors(
        embed_0, embed_1, targets, img_size, task_ids
    )
    H8, W8 = pred_prior.shape[1:3]

    def prior_pyramid(p):
        return (p, resize_bilinear_torch(p, H8 // 2, W8 // 2),
                resize_bilinear_torch(p, H8 // 4, W8 // 4))

    head_raw = model.apply(params, fpn_outs_1, prior_pyramid(pred_prior),
                           method=Unicorn.forward_head)
    loss_dict = unicorn_uni_loss(
        head_raw, embed_0, embed_1, pred_prior, gt_lbs1, targets, task_ids,
        img_size, num_classes=num_classes, mot_weight=mot_weight,
        sot_weight=sot_weight, bidirect=bidirect, use_l1=use_l1,
    )
    total = loss_dict["total_loss"]

    if mhs:
        # MOT-helps-SOT aux: run the SOT branch on MOT samples with a
        # synthetic single-instance label pair (unicorn.py:104-119)
        from ..losses.uni import build_mhs_labels

        mhs_targets, has_pair = build_mhs_labels(targets)
        mot_mask = (task_ids == 2)
        mhs_task = jnp.where(mot_mask & has_pair, 1, 0).astype(jnp.int32)
        mhs_prior, mhs_gt1 = build_sot_priors(
            embed_0, embed_1, mhs_targets, img_size, mhs_task)
        mhs_raw = model.apply(params, fpn_outs_1, prior_pyramid(mhs_prior),
                              method=Unicorn.forward_head)
        # mhs_task is in {0, 1}: sot_only skips the (provably zero) MOT
        # branch — the reference's mhs pass is SOT-loss-only too
        # (unicorn.py:119-121)
        mhs_dict = unicorn_uni_loss(
            mhs_raw, embed_0, embed_1, mhs_prior, mhs_gt1, mhs_targets,
            mhs_task, img_size, num_classes=num_classes, use_l1=use_l1,
            sot_only=True,
        )
        # reference adds the subset-normalized SOT loss directly
        # (unicorn.py:119-121); undo the n/B weighting uni_loss applies
        B = targets.shape[0]
        n_mhs = jnp.maximum(jnp.sum((mhs_task == 1).astype(jnp.float32)), 1.0)
        mhs_loss = mhs_dict["total_loss"] * B / n_mhs
        total = total + mhs_weight * mhs_loss
        loss_dict["mhs_loss"] = mhs_loss
        loss_dict["total_loss"] = total
    return total, loss_dict


def det_mask_loss_fn(model, params, images, labels, masks, img_size,
                     use_l1=False, strides=(8, 16, 32), max_inst=24,
                     sem_loss_on=False, boxinst=False, warmup_factor=1.0,
                     d_rate=4):
    """Instance-seg stage loss: det losses + CondInst mask dice over
    SimOTA-matched anchors (reference YOLOXHeadDetMask path,
    yolo_head_det_mask.py:34-841). masks: (B, M, Hm, Wm).

    boxinst=True switches the mask supervision to the box-supervised
    BoxInst projection + pairwise losses (losses/boxinst.py; the reference
    gates this via cfg MODEL.BOXINST.ENABLED, dynamic_mask_head.py:251-273)
    — `masks` is then unused and `warmup_factor` scales the pairwise term
    (min(iter/warmup_iters, 1))."""
    from ..losses.mask import condinst_mask_loss, semantic_focal_loss

    out = model.apply(params, images)
    head_raw, (mask_feats, up_mask, sem_logits) = out
    flat = flatten_raw_outputs(head_raw, "mot")
    boxes = decode_boxes(flat["reg_raw"], flat["hw"], strides)
    xs, ys, ss = level_grids(flat["hw"], strides)
    loss_dict, assign = yolox_losses(
        labels, boxes, flat["obj_logits"], flat["cls_logits"], flat["reg_raw"],
        xs, ys, ss, img_size, use_l1=use_l1,
    )
    if boxinst:
        from ..losses.boxinst import boxinst_mask_loss

        gt_valid = (jnp.sum(labels[..., 1:5], axis=2) > 0).astype(jnp.float32)
        prj_l, pw_l = boxinst_mask_loss(
            flat["ctrl"], mask_feats, assign.fg_mask, assign.matched_gt,
            assign.pred_iou, labels[..., 1:5], gt_valid, images,
            flat["hw"], strides, max_inst=max_inst, up_masks=up_mask,
            warmup_factor=warmup_factor, d_rate=d_rate,
        )
        mask_l = prj_l + pw_l
        loss_dict["boxinst_prj_loss"] = prj_l
        loss_dict["boxinst_pairwise_loss"] = pw_l
    else:
        mask_l = condinst_mask_loss(
            flat["ctrl"], mask_feats, assign.fg_mask, assign.matched_gt,
            assign.pred_iou, masks, flat["hw"], strides, max_inst=max_inst,
            up_masks=up_mask,
        )
    total = loss_dict["total_loss"] + mask_l
    loss_dict["condinst_loss"] = mask_l
    if sem_loss_on and sem_logits is not None:
        gt_valid = (jnp.sum(labels, axis=2) > 0).astype(jnp.float32)
        sem_l = semantic_focal_loss(
            sem_logits, masks, labels[..., 0].astype(jnp.int32), gt_valid,
            sem_logits.shape[-1])
        total = total + sem_l
        loss_dict["sem_loss"] = sem_l
    loss_dict["total_loss"] = total
    return total, loss_dict


def make_det_mask_train_step(model, img_size, use_l1=False, max_inst=24,
                             sem_loss_on=False, donate=True, boxinst=False,
                             boxinst_warmup_iters=10000, d_rate=4):
    """boxinst=True trains masks from boxes only (losses/boxinst.py); the
    pairwise term warms up linearly over boxinst_warmup_iters, driven by
    state.step (so resume keeps the schedule)."""
    def step(state, images, labels, masks):
        warmup = (jnp.minimum(state.step.astype(jnp.float32)
                              / float(boxinst_warmup_iters), 1.0)
                  if boxinst else 1.0)

        def loss(params):
            return det_mask_loss_fn(model, params, images, labels, masks,
                                    img_size, use_l1, max_inst=max_inst,
                                    sem_loss_on=sem_loss_on, boxinst=boxinst,
                                    warmup_factor=warmup, d_rate=d_rate)

        (_, loss_dict), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss_dict

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_det_train_step(model, img_size, use_l1=False, donate=True):
    def step(state, images, labels):
        def loss(params):
            return det_loss_fn(model, params, images, labels, img_size, use_l1)

        (_, loss_dict), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss_dict

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def uni_mask_loss_fn(model, params, images, targets, task_ids, masks,
                     img_size, mot_weight=1.0, bidirect=True, use_l1=False,
                     d_rate=2, use_raft=True, up_rate=8,
                     max_pairs=3, max_inst=24):
    """VOS+MOTS stage loss (reference ExpTrackMask path: unicorn.py:76-132
    with masks; task 1 = VOS, task 2 = MOTS)."""
    from ..losses.mask import condinst_mask_loss
    from ..losses.uni import mot_contrastive_loss_single
    from ..losses.vos import vos_loss
    from ..models.heads import level_grids
    from ..models.unicorn import Unicorn

    fpn_outs_1, embed_0, embed_1 = uni_forward_embeddings(model, params, images)
    vos_mask = (task_ids == 1).astype(jnp.float32)
    mots_mask = (task_ids == 2).astype(jnp.float32)
    B = targets.shape[0]

    head_apply = lambda f, p: model.apply(params, f, p, method=Unicorn.forward_head)
    mb_apply = lambda f: model.apply(params, f, method=Unicorn.forward_mask_branch)

    vos_dict = vos_loss(
        model, params, head_apply, mb_apply, fpn_outs_1, embed_0, embed_1,
        targets, masks, img_size, max_pairs=max_pairs, d_rate=d_rate,
        use_raft=use_raft, up_rate=up_rate, sample_mask=vos_mask,
        use_l1=use_l1,
    )

    # MOTS: MOT head loss + condinst mask loss over fg anchors
    priors = tuple(
        jnp.zeros(f.shape[:3] + (1,), f.dtype) for f in fpn_outs_1
    )
    raw = head_apply(fpn_outs_1, priors)
    flat = flatten_raw_outputs(raw, "mot")
    hw = flat["hw"]
    xs, ys, ss = level_grids(hw, (8, 16, 32))
    boxes = decode_boxes(flat["reg_raw"], hw, (8, 16, 32))
    mot_dict, assign = yolox_losses(
        targets[:, 1, :, :5], boxes, flat["obj_logits"], flat["cls_logits"],
        flat["reg_raw"], xs, ys, ss, img_size, use_l1=use_l1,
        sample_mask=mots_mask,
    )
    mask_feats, up_mask, _ = mb_apply(fpn_outs_1)
    mots_mask_l = condinst_mask_loss(
        flat["ctrl"], mask_feats, assign.fg_mask, assign.matched_gt,
        assign.pred_iou, masks[:, 1], hw, (8, 16, 32), max_inst=max_inst,
        up_masks=up_mask, up_rate=up_rate, sample_mask=mots_mask,
    )
    corr_mot_b = jax.vmap(
        lambda e0, e1, t: mot_contrastive_loss_single(e0, e1, t, bidirect)
    )(embed_0.astype(jnp.float32), embed_1.astype(jnp.float32), targets)
    n_mots = jnp.maximum(jnp.sum(mots_mask), 1.0)
    corr_mot = jnp.sum(corr_mot_b * mots_mask) / n_mots
    total_mots = mot_dict["total_loss"] + mots_mask_l + corr_mot
    if mot_weight > 1.0:
        total_mots = total_mots + mot_dict["conf_loss"] * (mot_weight - 1.0)

    n_vos = jnp.sum(vos_mask)
    n_mots_f = jnp.sum(mots_mask)
    total = (n_vos * vos_dict["total_loss"] + n_mots_f * total_mots) / B
    out = {"total_loss": total,
           "condinst_loss_mots": mots_mask_l, "corr_loss_mots": corr_mot}
    for k, v in vos_dict.items():
        if k != "total_loss":
            out[k + "_vos"] = v
    for k, v in mot_dict.items():
        if k != "total_loss":
            out[k + "_mots"] = v
    return total, out


def make_uni_mask_train_step(model, img_size, mot_weight=1.0, bidirect=True,
                             use_l1=False, d_rate=2,
                             use_raft=True, up_rate=8, max_inst=24,
                             donate=True):
    def step(state, images, targets, task_ids, masks):
        def loss(params):
            return uni_mask_loss_fn(
                model, params, images, targets, task_ids, masks, img_size,
                mot_weight, bidirect, use_l1, d_rate,
                use_raft, up_rate, max_inst=max_inst,
            )

        (_, loss_dict), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss_dict

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_uni_train_step(model, img_size, mot_weight=1.0, sot_weight=1.0,
                        bidirect=True, use_l1=False, num_classes=8,
                        mhs=False, mhs_weight=0.5, donate=True,
                        backbone_map=False):
    def step(state, images, targets, task_ids):
        def loss(params):
            return uni_loss_fn(
                model, params, images, targets, task_ids, img_size,
                mot_weight, sot_weight, bidirect, use_l1, num_classes,
                mhs, mhs_weight, backbone_map,
            )

        (_, loss_dict), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss_dict

    return jax.jit(step, donate_argnums=(0,) if donate else ())
