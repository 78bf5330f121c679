"""Box/track drawing utilities (reference unicorn/utils/visualize.py)."""
from __future__ import annotations

import cv2
import numpy as np

_COLORS = (np.array([
    [0.000, 0.447, 0.741], [0.850, 0.325, 0.098], [0.929, 0.694, 0.125],
    [0.494, 0.184, 0.556], [0.466, 0.674, 0.188], [0.301, 0.745, 0.933],
    [0.635, 0.078, 0.184], [0.300, 0.300, 0.300], [0.600, 0.600, 0.600],
    [1.000, 0.000, 0.000], [1.000, 0.500, 0.000], [0.749, 0.749, 0.000],
    [0.000, 1.000, 0.000], [0.000, 0.000, 1.000], [0.667, 0.000, 1.000],
]) * 255).astype(np.uint8)


def draw_detections(img, dets, class_names=None):
    """dets: (N, 7) [x1,y1,x2,y2,obj,cls_conf,cls_id]."""
    vis = img.copy()
    if dets is None or len(dets) == 0:
        return vis
    for d in dets:
        x1, y1, x2, y2 = map(int, d[:4])
        cls_id = int(d[6]) if len(d) > 6 else 0
        score = float(d[4] * d[5]) if len(d) > 6 else float(d[4])
        color = tuple(int(c) for c in _COLORS[cls_id % len(_COLORS)])
        cv2.rectangle(vis, (x1, y1), (x2, y2), color, 2)
        name = class_names[cls_id] if class_names else str(cls_id)
        cv2.putText(vis, f"{name}:{score:.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return vis


def draw_tracks(img, tlwhs, track_ids, scores=None):
    vis = img.copy()
    for i, (tlwh, tid) in enumerate(zip(tlwhs, track_ids)):
        x, y, w, h = map(int, tlwh)
        color = tuple(int(c) for c in _COLORS[int(tid) % len(_COLORS)])
        cv2.rectangle(vis, (x, y), (x + w, y + h), color, 2)
        cv2.putText(vis, str(int(tid)), (x, max(y - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.6, color, 2)
    return vis


def draw_masks(img, mask_indexed, alpha=0.5):
    """mask_indexed: (H, W) int labels."""
    vis = img.copy().astype(np.float32)
    for oid in np.unique(mask_indexed):
        if oid == 0:
            continue
        color = _COLORS[int(oid) % len(_COLORS)].astype(np.float32)
        m = mask_indexed == oid
        vis[m] = vis[m] * (1 - alpha) + color * alpha
    return vis.astype(np.uint8)
