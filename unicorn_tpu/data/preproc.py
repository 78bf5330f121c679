"""Letterbox preprocessing (host-side numpy/cv2) — HWC, TPU NHWC layout.

Reference: unicorn/data/data_augment.py:194-239 (`preproc`, `preproc_mask`).
Scale-preserving resize to fit input_size, pad bottom/right with 114.
Returns HWC float32 (no channel swap — the TPU models are NHWC).
An on-device Pallas/XLA variant lives in unicorn_tpu.ops.letterbox for the
streaming driver.
"""
from __future__ import annotations

import cv2
import numpy as np


def letterbox(img: np.ndarray, input_size) -> tuple[np.ndarray, float]:
    """img: (H, W, 3) uint8 BGR. Returns (padded float32 HWC, scale r)."""
    if img.ndim == 3:
        padded = np.full((input_size[0], input_size[1], 3), 114, dtype=np.uint8)
    else:
        padded = np.full(input_size, 114, dtype=np.uint8)
    r = min(input_size[0] / img.shape[0], input_size[1] / img.shape[1])
    rw, rh = int(img.shape[1] * r), int(img.shape[0] * r)
    resized = cv2.resize(img, (rw, rh), interpolation=cv2.INTER_LINEAR).astype(np.uint8)
    padded[:rh, :rw] = resized
    return np.ascontiguousarray(padded, dtype=np.float32), r


def letterbox_mask(mask: np.ndarray, input_size) -> tuple[np.ndarray, float]:
    """mask: (H, W, K) binary. Returns (padded float32 (input_h, input_w, K), r)."""
    if mask.ndim == 2:
        mask = mask[:, :, None]
    padded = np.zeros((input_size[0], input_size[1], mask.shape[2]), dtype=np.uint8)
    r = min(input_size[0] / mask.shape[0], input_size[1] / mask.shape[1])
    rw, rh = int(mask.shape[1] * r), int(mask.shape[0] * r)
    if r != 1:
        resized = cv2.resize(mask, (rw, rh), interpolation=cv2.INTER_LINEAR)
        if resized.ndim == 2:
            resized = resized[:, :, None]
        resized = resized.astype(np.uint8)
    else:
        resized = mask.astype(np.uint8)
    padded[:rh, :rw] = resized
    return np.ascontiguousarray(padded, dtype=np.float32), r
