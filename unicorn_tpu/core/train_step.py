"""Jitted train-step factories for the det and uni stages.

The uni step reimplements UnicornActor (reference unicorn/models/unicorn.py:
470-507): stack the 2 frames into one 2B batch through the backbone, run
fp32 interaction + upsample, build SOT priors via correlation propagation,
one unified head call, masked task losses.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

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


def uni_forward_embeddings(model: Unicorn, params, images):
    """Backbone + interaction + upsample for a 2-frame batch.

    images: (B, 2, H, W, 3). Returns (fpn_outs_1, embed_0, embed_1).
    Matches UnicornActor: both frames share one backbone pass as a 2B batch
    (frame-major concat, unicorn.py:491-495).
    """
    B, nF, H, W, _ = images.shape
    assert nF == 2
    imgs_flat = images.transpose(1, 0, 2, 3, 4).reshape(2 * B, H, W, 3)
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
                num_classes=8):
    """Full unified SOT+MOT loss for a (B, 2, ...) batch."""
    fpn_outs_1, embed_0, embed_1 = uni_forward_embeddings(model, params, images)
    pred_prior, gt_lbs1 = build_sot_priors(
        embed_0, embed_1, targets, img_size, task_ids
    )
    H8, W8 = pred_prior.shape[1:3]
    priors = (
        pred_prior,
        resize_bilinear_torch(pred_prior, H8 // 2, W8 // 2),
        resize_bilinear_torch(pred_prior, H8 // 4, W8 // 4),
    )
    head_raw = model.apply(params, fpn_outs_1, priors, method=Unicorn.forward_head)
    loss_dict = unicorn_uni_loss(
        head_raw, embed_0, embed_1, pred_prior, gt_lbs1, targets, task_ids,
        img_size, num_classes=num_classes, mot_weight=mot_weight,
        sot_weight=sot_weight, bidirect=bidirect, use_l1=use_l1,
    )
    return loss_dict["total_loss"], loss_dict


def make_det_train_step(model, img_size, use_l1=False, donate=True):
    def step(state, images, labels):
        def loss(params):
            return det_loss_fn(model, params, images, labels, img_size, use_l1)

        (_, loss_dict), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss_dict

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_uni_train_step(model, img_size, mot_weight=1.0, sot_weight=1.0,
                        bidirect=True, use_l1=False, num_classes=8, donate=True):
    def step(state, images, targets, task_ids):
        def loss(params):
            return uni_loss_fn(
                model, params, images, targets, task_ids, img_size,
                mot_weight, sot_weight, bidirect, use_l1, num_classes,
            )

        (_, loss_dict), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, loss_dict

    return jax.jit(step, donate_argnums=(0,) if donate else ())
