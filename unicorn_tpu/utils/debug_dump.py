"""Debug visualization dumps (reference Trainer.debug_data, trainer.py:97-141
and Unicorn mode="debug", unicorn.py:140-227): write augmented batches with
boxes/masks drawn, then stop — for validating the data pipeline by eye."""
from __future__ import annotations

import os

import cv2
import numpy as np

from .visualize import _COLORS


def dump_uni_batch(save_dir, images, targets, task_ids, masks=None,
                   prefix="batch"):
    """images (B, 2, H, W, 3) float; targets (B, 2, M, 6) [cls cx cy w h tid];
    masks optional (B, 2, M, Hm, Wm)."""
    os.makedirs(save_dir, exist_ok=True)
    B = images.shape[0]
    for b in range(B):
        for f in range(2):
            img = np.clip(np.asarray(images[b, f]), 0, 255).astype(np.uint8).copy()
            for m in range(targets.shape[2]):
                cls, cx, cy, w, h, tid = targets[b, f, m]
                if w <= 0 or h <= 0:
                    continue
                color = tuple(int(c) for c in _COLORS[int(tid) % len(_COLORS)])
                cv2.rectangle(img, (int(cx - w / 2), int(cy - h / 2)),
                              (int(cx + w / 2), int(cy + h / 2)), color, 2)
                cv2.putText(img, f"t{int(tid)}c{int(cls)}",
                            (int(cx - w / 2), max(int(cy - h / 2) - 3, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.4, color, 1)
            if masks is not None:
                Hm, Wm = masks.shape[3:]
                overlay = np.zeros((Hm, Wm, 3), np.float32)
                for m in range(masks.shape[2]):
                    mm = np.asarray(masks[b, f, m]) > 0.5
                    overlay[mm] = _COLORS[m % len(_COLORS)]
                overlay = cv2.resize(overlay, (img.shape[1], img.shape[0]),
                                     interpolation=cv2.INTER_NEAREST)
                # blend only where a mask is painted: blending the whole
                # frame with the mostly-zero overlay would dim every pixel
                # and wash out the box/label annotations drawn above
                on = overlay.any(axis=2, keepdims=True)
                img = np.where(on, 0.6 * img + 0.4 * overlay,
                               img).astype(np.uint8)
            task = int(task_ids[b])
            cv2.imwrite(os.path.join(
                save_dir, f"{prefix}_b{b}_f{f}_task{task}.jpg"), img)
    return save_dir
