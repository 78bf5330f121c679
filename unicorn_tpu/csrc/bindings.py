"""ctypes bindings for the native library (fast COCOeval matcher).

Role-equivalent of unicorn/layers/fast_coco_eval_api.py wrapping unicorn._C.
"""
from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from .build import build

_lib = None
_tried = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is None and not _tried:
        _tried = True
        path = build()
        if path:
            _lib = ctypes.CDLL(path)
            _lib.cocoeval_evaluate_img.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
            ]
    return _lib


def evaluate_img_native(ious: np.ndarray, gt_ignore: np.ndarray,
                        gt_iscrowd: np.ndarray, thresholds: np.ndarray):
    """ious (D, G) with gts sorted non-ignored-first. Returns
    (dt_match (T, D) int64, dt_ignore (T, D) bool) or None if no native lib."""
    lib = get_lib()
    if lib is None:
        return None
    D, G = ious.shape
    T = len(thresholds)
    ious = np.ascontiguousarray(ious, np.float64)
    gt_ignore = np.ascontiguousarray(gt_ignore, np.uint8)
    gt_iscrowd = np.ascontiguousarray(gt_iscrowd, np.uint8)
    thresholds = np.ascontiguousarray(thresholds, np.float64)
    dt_match = np.full((T, D), -1, np.int64)
    dt_ignore = np.zeros((T, D), np.uint8)
    lib.cocoeval_evaluate_img(
        ious.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(D), ctypes.c_int64(G),
        gt_ignore.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        gt_iscrowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        thresholds.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(T),
        dt_match.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dt_ignore.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return dt_match, dt_ignore.astype(bool)
