"""Association cost matrices + linear assignment.

Reference: unicorn/tracker/matching.py:39-180. `lap.lapjv(cost, extend_cost,
cost_limit)` is replaced by scipy's Hungarian on the standard dummy-padded
square matrix: real->dummy edges cost cost_limit/2 and the dummy->dummy block
costs 0 (lapjv's extend_cost construction), so a real pair at cost c is kept
iff c < cost_limit — routing both nodes through dummies costs exactly
cost_limit with the spare dummies pairing up for free.
"""
from __future__ import annotations

import numpy as np
from scipy.optimize import linear_sum_assignment

from .kalman import CHI2INV95


def linear_assignment(cost_matrix: np.ndarray, thresh: float):
    """Returns (matches (K,2), unmatched_a, unmatched_b)."""
    if cost_matrix.size == 0:
        return (np.empty((0, 2), int),
                tuple(range(cost_matrix.shape[0])),
                tuple(range(cost_matrix.shape[1])))
    n, m = cost_matrix.shape
    ext = np.full((n + m, n + m), thresh / 2.0, dtype=np.float64)
    ext[:n, :m] = cost_matrix
    ext[n:, m:] = 0.0  # dummy-dummy block is free (lapjv extend_cost)
    rows, cols = linear_sum_assignment(ext)
    matches = []
    matched_a, matched_b = set(), set()
    for r, c in zip(rows, cols):
        # strict < thresh: lapjv rejects pairs at exactly cost_limit, and
        # Hungarian may break the tie either way on the extended matrix.
        if r < n and c < m and cost_matrix[r, c] < thresh:
            matches.append([r, c])
            matched_a.add(r)
            matched_b.add(c)
    unmatched_a = tuple(i for i in range(n) if i not in matched_a)
    unmatched_b = tuple(j for j in range(m) if j not in matched_b)
    return np.asarray(matches, int).reshape(-1, 2), unmatched_a, unmatched_b


def inclusive_iou_np(boxes_a: np.ndarray, boxes_b: np.ndarray) -> np.ndarray:
    """IoU with the +1 inclusive-pixel convention of cython_bbox.bbox_overlaps,
    which the reference's iou_distance uses (unicorn/tracker/matching.py:58-66).
    """
    if len(boxes_a) == 0 or len(boxes_b) == 0:
        return np.zeros((len(boxes_a), len(boxes_b)), dtype=np.float32)
    tl = np.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    br = np.minimum(boxes_a[:, None, 2:4], boxes_b[None, :, 2:4])
    wh = np.clip(br - tl + 1.0, 0, None)
    area_i = wh[..., 0] * wh[..., 1]
    area_a = np.prod(boxes_a[:, 2:4] - boxes_a[:, :2] + 1.0, axis=1)
    area_b = np.prod(boxes_b[:, 2:4] - boxes_b[:, :2] + 1.0, axis=1)
    return area_i / (area_a[:, None] + area_b[None, :] - area_i + 1e-12)


def iou_distance(atracks, btracks) -> np.ndarray:
    """1 - IoU between track tlbr boxes (inclusive-pixel convention)."""
    if len(atracks) and isinstance(atracks[0], np.ndarray):
        a_boxes, b_boxes = atracks, btracks
    else:
        a_boxes = [t.tlbr for t in atracks]
        b_boxes = [t.tlbr for t in btracks]
    ious = inclusive_iou_np(
        np.ascontiguousarray(a_boxes, np.float32).reshape(-1, 4),
        np.ascontiguousarray(b_boxes, np.float32).reshape(-1, 4),
    )
    return 1.0 - ious


def embedding_distance(tracks, detections, metric="cosine") -> np.ndarray:
    """Cosine distance between track smooth features and det features."""
    cost = np.zeros((len(tracks), len(detections)), np.float32)
    if cost.size == 0:
        return cost
    det_feats = np.asarray([d.curr_feat for d in detections], np.float32)
    trk_feats = np.asarray([t.smooth_feat for t in tracks], np.float32)
    det_n = det_feats / (np.linalg.norm(det_feats, axis=1, keepdims=True) + 1e-12)
    trk_n = trk_feats / (np.linalg.norm(trk_feats, axis=1, keepdims=True) + 1e-12)
    return np.maximum(0.0, 1.0 - trk_n @ det_n.T)


def fuse_motion(kf, cost_matrix, tracks, detections, only_position=False,
                lambda_=0.98):
    if cost_matrix.size == 0:
        return cost_matrix
    gating_dim = 2 if only_position else 4
    gating_threshold = CHI2INV95[gating_dim]
    measurements = np.asarray([d.to_xyah() for d in detections])
    for row, track in enumerate(tracks):
        gd = kf.gating_distance(track.mean, track.covariance, measurements,
                                only_position, metric="maha")
        cost_matrix[row, gd > gating_threshold] = np.inf
        cost_matrix[row] = lambda_ * cost_matrix[row] + (1 - lambda_) * gd
    return cost_matrix


def fuse_iou(cost_matrix, tracks, detections):
    if cost_matrix.size == 0:
        return cost_matrix
    reid_sim = 1.0 - cost_matrix
    iou_sim = 1.0 - iou_distance(tracks, detections)
    fuse_sim = reid_sim * (1.0 + iou_sim) / 2.0
    # the reference computes det_scores but leaves the score blending
    # commented out (matching.py:166-168) — parity means NOT applying it
    return 1.0 - fuse_sim


def fuse_score(cost_matrix, detections):
    if cost_matrix.size == 0:
        return cost_matrix
    iou_sim = 1.0 - cost_matrix
    det_scores = np.array([d.score for d in detections])
    fuse_sim = iou_sim * np.broadcast_to(det_scores, cost_matrix.shape)
    return 1.0 - fuse_sim
