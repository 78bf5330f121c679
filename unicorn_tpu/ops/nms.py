"""On-device fixed-shape NMS + detection postprocess.

TPU-native replacement for the reference's host-side torchvision NMS
(unicorn/utils/boxes.py:33-79): confidence filter, class-aware NMS (via the
coordinate-offset trick), and top-K selection all run inside jit with static
shapes, so only a tiny (max_out, 7) tensor crosses the host boundary — the
device->host link is the bottleneck of the online tracking loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _iou_matrix_xyxy(boxes):
    """(N, 4) xyxy -> (N, N) IoU."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)
    ix1 = jnp.maximum(x1[:, None], x1[None, :])
    iy1 = jnp.maximum(y1[:, None], y1[None, :])
    ix2 = jnp.minimum(x2[:, None], x2[None, :])
    iy2 = jnp.minimum(y2[:, None], y2[None, :])
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    return inter / (areas[:, None] + areas[None, :] - inter + 1e-12)


def nms_fixed(boxes, scores, iou_threshold: float, n_cand: int,
              cluster_iters: int = 0, approx_topk: bool = False):
    """Greedy NMS over the top-n_cand scoring boxes, static shapes.

    boxes (A, 4) xyxy, scores (A,). Returns (keep_mask (n_cand,), order
    (n_cand,) indices into the input). Matches torchvision semantics
    (suppress strictly-greater IoU, descending score order).

    cluster_iters > 0 switches to Cluster-NMS (parallel fixed-point
    iteration: keep <- no higher-scored KEPT box suppresses me), which
    converges to EXACT greedy NMS in <= suppression-chain-depth iterations
    (usually < 5) — each iteration is one matmul-shaped reduction instead of
    n_cand sequential steps. Used by the streaming serving path.
    """
    if approx_topk:
        # TPU-optimized approximate candidate selection (recall >= 0.99 of
        # the exact top-n_cand; measured free vs 0.1 ms exact at A=21k).
        # Serving-path knob — eval tools keep the exact top_k default.
        top_scores, order = jax.lax.approx_max_k(
            scores, n_cand, recall_target=0.99)
    else:
        top_scores, order = jax.lax.top_k(scores, n_cand)
    cand = boxes[order]
    iou = _iou_matrix_xyxy(cand)
    upper = jnp.arange(n_cand)[:, None] < jnp.arange(n_cand)[None, :]
    sup_mat = (iou > iou_threshold) & upper  # i suppresses j (i higher score)

    if cluster_iters > 0:
        def body(_, keep):
            # j survives iff no kept higher-scored i suppresses it
            return ~jnp.any(sup_mat & keep[:, None], axis=0)

        keep = jax.lax.fori_loop(0, cluster_iters, body,
                                 jnp.ones((n_cand,), bool))
    else:
        def body(i, suppressed):
            keep_i = jnp.logical_not(suppressed[i])
            return suppressed | (sup_mat[i] & keep_i)

        suppressed = jax.lax.fori_loop(0, n_cand, body,
                                       jnp.zeros((n_cand,), bool))
        keep = ~suppressed
    keep = keep & (top_scores > -jnp.inf)
    return keep, order


@partial(jax.jit, static_argnames=("num_classes", "class_agnostic", "n_cand",
                                   "max_out", "cluster_iters", "approx_topk",
                                   "return_idx"))
def postprocess_device(prediction, num_classes: int, conf_thre: float = 0.7,
                       nms_thre: float = 0.45, class_agnostic: bool = False,
                       n_cand: int = 512, max_out: int = 128,
                       cluster_iters: int = 0, approx_topk: bool = False,
                       return_idx: bool = False):
    """Full decode-side postprocess on device (boxes.py:33-79 parity).

    prediction: (B, A, 5+C) [cxcywh, obj_sig, cls_sig...].
    Returns dets (B, max_out, 7) [x1,y1,x2,y2,obj,cls_conf,cls_id] sorted by
    score, and valid (B, max_out) bool. Invalid rows are zero.
    return_idx additionally returns the kept rows' ANCHOR indices
    (B, max_out) int32 — the handle CondInst needs to fetch each kept
    detection's dynamic-conv controller params.
    """

    n_cand = min(n_cand, prediction.shape[1])
    max_out = min(max_out, n_cand)

    def one(img_pred):
        boxes = img_pred[:, :4]
        xy1 = boxes[:, :2] - boxes[:, 2:4] / 2
        xy2 = boxes[:, :2] + boxes[:, 2:4] / 2
        boxes_xyxy = jnp.concatenate([xy1, xy2], axis=1)
        obj = img_pred[:, 4]
        cls_scores = img_pred[:, 5: 5 + num_classes]
        cls_conf = jnp.max(cls_scores, axis=1)
        cls_id = jnp.argmax(cls_scores, axis=1).astype(jnp.float32)
        score = obj * cls_conf
        valid = score >= conf_thre
        score_m = jnp.where(valid, score, -jnp.inf)

        if class_agnostic:
            nms_boxes = boxes_xyxy
        else:
            max_coord = jnp.max(jnp.where(valid[:, None], boxes_xyxy, 0.0))
            nms_boxes = boxes_xyxy + cls_id[:, None] * (max_coord + 1.0)

        keep, order = nms_fixed(nms_boxes, score_m, nms_thre, n_cand,
                                cluster_iters=cluster_iters,
                                approx_topk=approx_topk)
        keep = keep & (score_m[order] > -jnp.inf)
        # compact kept rows to the front, preserving score order
        rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dst = jnp.where(keep, rank, n_cand)  # discarded -> scratch slot
        rows = jnp.stack([
            boxes_xyxy[order][:, 0], boxes_xyxy[order][:, 1],
            boxes_xyxy[order][:, 2], boxes_xyxy[order][:, 3],
            obj[order], cls_conf[order], cls_id[order],
        ], axis=1)
        out = jnp.zeros((n_cand + 1, 7), rows.dtype).at[dst].set(rows)[:max_out]
        n_keep = jnp.sum(keep.astype(jnp.int32))
        valid_out = jnp.arange(max_out) < n_keep
        idx_out = jnp.zeros((n_cand + 1,), jnp.int32).at[dst].set(
            order.astype(jnp.int32))[:max_out]
        return out, valid_out, idx_out

    dets, valid, idx = jax.vmap(one)(prediction)
    if return_idx:
        return dets, valid, idx
    return dets, valid
