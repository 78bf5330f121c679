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
            i64p = ctypes.POINTER(ctypes.c_int64)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            _lib.rle_encode_flat.restype = ctypes.c_int64
            _lib.rle_encode_flat.argtypes = [u8p, ctypes.c_int64, i64p]
            _lib.rle_decode.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                        ctypes.c_int64, u8p]
            _lib.rle_to_string.restype = ctypes.c_int64
            _lib.rle_to_string.argtypes = [i64p, ctypes.c_int64, ctypes.c_char_p]
            _lib.rle_from_string.restype = ctypes.c_int64
            _lib.rle_from_string.argtypes = [ctypes.c_char_p, ctypes.c_int64, i64p]
            _lib.rle_area.restype = ctypes.c_int64
            _lib.rle_area.argtypes = [i64p, ctypes.c_int64]
            _lib.rle_iou.argtypes = [i64p, i64p, ctypes.c_int64,
                                     i64p, i64p, ctypes.c_int64,
                                     u8p, ctypes.POINTER(ctypes.c_double)]
            _lib.rle_merge.restype = ctypes.c_int64
            _lib.rle_merge.argtypes = [i64p, i64p, ctypes.c_int64,
                                       ctypes.c_int64, ctypes.c_int64,
                                       ctypes.c_int64, i64p]
            c64 = ctypes.c_int64
            _lib.pack_frames_s2d4.argtypes = [u8p, c64, c64, c64, c64, u8p]
    return _lib


def _i64(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def rle_encode_native(mask: np.ndarray):
    """(H, W) 0/1 mask -> column-major counts (int64 array), or None."""
    lib = get_lib()
    if lib is None:
        return None
    h, w = mask.shape
    flat = np.asfortranarray(mask, np.uint8).ravel(order="K")
    out = np.empty(h * w + 2, np.int64)
    n = lib.rle_encode_flat(
        flat.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h * w, _i64(out))
    return out[:n]


def rle_decode_native(counts, h: int, w: int):
    """counts -> row-major (H, W) uint8 mask, or None."""
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, np.int64)
    mask = np.zeros((h, w), np.uint8)
    lib.rle_decode(_i64(counts), len(counts), h, w,
                   mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return mask


def rle_to_string_native(counts):
    lib = get_lib()
    if lib is None:
        return None
    counts = np.ascontiguousarray(counts, np.int64)
    buf = ctypes.create_string_buffer(13 * max(len(counts), 1) + 1)
    n = lib.rle_to_string(_i64(counts), len(counts), buf)
    return buf.raw[:n].decode("ascii")


def rle_from_string_native(s: str):
    lib = get_lib()
    if lib is None:
        return None
    raw = s.encode("ascii")
    out = np.empty(max(len(raw), 1), np.int64)
    n = lib.rle_from_string(raw, len(raw), _i64(out))
    return out[:n]


def _flatten_counts(rles):
    counts = [np.ascontiguousarray(r, np.int64) for r in rles]
    off = np.zeros(len(counts) + 1, np.int64)
    np.cumsum([len(c) for c in counts], out=off[1:])
    flat = (np.concatenate(counts) if counts
            else np.empty(0, np.int64))
    return np.ascontiguousarray(flat), off


def rle_iou_native(d_counts_list, g_counts_list, iscrowd=None):
    """Lists of uncompressed counts -> (D, G) IoU matrix, or None.

    RLE-domain interval intersection; never decodes to dense pixels."""
    lib = get_lib()
    if lib is None:
        return None
    D, G = len(d_counts_list), len(g_counts_list)
    if D == 0 or G == 0:
        return np.zeros((D, G))
    dflat, doff = _flatten_counts(d_counts_list)
    gflat, goff = _flatten_counts(g_counts_list)
    crowd = np.zeros(G, np.uint8) if iscrowd is None else \
        np.ascontiguousarray(iscrowd, np.uint8)
    out = np.zeros((D, G), np.float64)
    lib.rle_iou(_i64(dflat), _i64(doff), D, _i64(gflat), _i64(goff), G,
                crowd.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return out


def rle_merge_native(counts_list, h: int, w: int, intersect: bool = False):
    """Union (or intersection) of masks given as counts lists -> counts."""
    lib = get_lib()
    if lib is None:
        return None
    flat, off = _flatten_counts(counts_list)
    out = np.empty(h * w + 2, np.int64)
    n = lib.rle_merge(_i64(flat), _i64(off), len(counts_list), h, w,
                      int(intersect), _i64(out))
    return out[:n]


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


def pack_frames_s2d4(frames: np.ndarray) -> Optional[np.ndarray]:
    """Native 4x4 space-to-depth pack for uint8 frames (serving ingest);
    returns None if the native lib is unavailable or dtype isn't uint8."""
    lib = get_lib()
    if lib is None or frames.dtype != np.uint8 or frames.ndim != 4:
        return None
    frames = np.ascontiguousarray(frames)
    n, h, w, c = frames.shape
    if h % 4 or w % 4:
        # match the numpy fallback, which raises on the reshape — the native
        # kernel would otherwise silently crop the remainder rows/cols
        raise ValueError(f"pack_frames_s2d4 needs H, W divisible by 4, "
                         f"got {h}x{w}")
    out = np.empty((n, h // 4, w // 4, 16 * c), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.pack_frames_s2d4(frames.ctypes.data_as(u8p), n, h, w, c,
                         out.ctypes.data_as(u8p))
    return out
