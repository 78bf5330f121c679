"""DAVIS J&F metrics: region Jaccard + boundary F-measure.

Reference: external/davis2017-evaluation/davis2017/metrics.py (db_eval_iou,
db_eval_boundary with morphological boundary extraction + bipartite pixel
matching via dilation) — reimplemented with cv2 morphology.
"""
from __future__ import annotations

import cv2
import numpy as np


def jaccard(pred: np.ndarray, gt: np.ndarray) -> float:
    """Region similarity J for binary masks."""
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    union = (pred | gt).sum()
    if union == 0:
        return 1.0 if pred.sum() == gt.sum() else 0.0
    return float((pred & gt).sum() / union)


def _seg2bmap(seg: np.ndarray) -> np.ndarray:
    """Binary boundary map via XOR with 1-pixel shifts (metrics.py seg2bmap)."""
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]
    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    # last row/col are ASSIGNED, not OR-ed (metrics.py:163-165): the
    # vertical/diagonal shift terms there compare against zero padding and
    # would mark every border-touching foreground pixel as boundary
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = 0
    return b


def boundary_f(pred: np.ndarray, gt: np.ndarray,
               bound_th: float = 0.008) -> float:
    """Boundary F-measure with dilation-based matching."""
    fg_boundary = _seg2bmap(pred)
    gt_boundary = _seg2bmap(gt)
    bound_pix = max(1, int(np.ceil(bound_th * np.linalg.norm(pred.shape))))
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                       (2 * bound_pix + 1, 2 * bound_pix + 1))
    fg_dil = cv2.dilate(fg_boundary.astype(np.uint8), kernel) > 0
    gt_dil = cv2.dilate(gt_boundary.astype(np.uint8), kernel) > 0
    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil
    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()
    if n_fg == 0 and n_gt == 0:
        return 1.0
    if n_fg == 0 or n_gt == 0:
        return 0.0
    precision = fg_match.sum() / n_fg
    recall = gt_match.sum() / n_gt
    if precision + recall == 0:
        return 0.0
    return float(2 * precision * recall / (precision + recall))


def evaluate_davis(pred_masks: dict, gt_masks: dict, skip_first_last=True):
    """pred/gt: {seq: list of (H, W) indexed masks}. Per-object J & F,
    averaged DAVIS-style (mean over objects of per-sequence means;
    frames 1..N-2 by convention).

    The two lists MUST be frame-aligned: entry t of preds and gts describe
    the SAME video frame. DAVIS ships one gt per frame so full per-frame
    prediction lists align naturally; YouTube-VOS valid ships sparse
    Annotations (first-appearance frames only), so the caller must subset
    its predictions to the annotated frame names first (tools/test.py does
    this by frame stem).

    Object ids are collected over ALL frames, not just frame 0: YouTube-VOS
    objects can enter mid-video (reference handles this at
    external/lib/test/tracker/unicorn_vos.py:86-101). Each object is scored
    from the frame after its first gt appearance (its reference frame is
    given, like DAVIS frame 0)."""
    j_means, f_means = [], []
    for seq, gts in gt_masks.items():
        if seq not in pred_masks:
            continue
        preds = pred_masks[seq]
        obj_first: dict = {}
        for t, g in enumerate(gts):
            for oid in np.unique(g):
                if oid != 0 and int(oid) not in obj_first:
                    obj_first[int(oid)] = t
        lo = 1 if skip_first_last else 0
        hi = len(gts) - 1 if skip_first_last else len(gts)
        for oid in sorted(obj_first):
            start = obj_first[oid] + (1 if skip_first_last else 0)
            js, fs = [], []
            for t in range(max(lo, start), hi):
                p = preds[t] == oid
                g = gts[t] == oid
                js.append(jaccard(p, g))
                fs.append(boundary_f(p, g))
            if js:
                j_means.append(np.mean(js))
                f_means.append(np.mean(fs))
    J = float(np.mean(j_means)) if j_means else 0.0
    F = float(np.mean(f_means)) if f_means else 0.0
    return {"J": J, "F": F, "J&F": (J + F) / 2,
            "n_objects": len(j_means)}
