"""COCO run-length-encoded mask codec (no pycocotools).

Implements the COCO mask API formats: uncompressed RLE
({"size": [h, w], "counts": [int, ...]}, column-major runs starting with
zeros) and the compressed string form (5-bit varint chars offset by 48, with
delta coding of counts beyond the second).

The hot paths (string codec, decode, IoU, merge) dispatch to the native C++
codec in csrc/rle.cpp — the role-equivalent of pycocotools' C maskApi the
reference relies on — and fall back to the pure Python/numpy forms below when
the native library is unavailable (parity-tested in tests/test_native.py).
"""
from __future__ import annotations

import numpy as np

from ..csrc import bindings as _native


def encode_counts(mask: np.ndarray) -> dict:
    """mask: (H, W) bool/0-1 -> uncompressed RLE dict."""
    h, w = mask.shape
    counts = _native.rle_encode_native(mask)
    if counts is not None:
        return {"size": [h, w], "counts": counts.tolist()}
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    # runs: starts with count of zeros
    changes = np.flatnonzero(np.diff(flat))
    counts = np.diff(np.concatenate([[-1], changes, [len(flat) - 1]])).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def decode_counts(rle: dict) -> np.ndarray:
    """Uncompressed RLE dict -> (H, W) uint8 mask."""
    h, w = rle["size"]
    counts = rle["counts"]
    mask = _native.rle_decode_native(counts, h, w)
    if mask is not None:
        return mask
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for c in counts:
        flat[pos: pos + c] = val
        pos += c
        val = 1 - val
    return flat.reshape((w, h)).T  # column-major


def compress(rle: dict) -> dict:
    """Uncompressed -> compressed string RLE (COCO maskApi rleToString)."""
    counts = rle["counts"]
    s = _native.rle_to_string_native(counts)
    if s is not None:
        return {"size": rle["size"], "counts": s}
    s = []
    for i, x in enumerate(counts):
        x = int(x)
        if i > 2:
            x -= int(counts[i - 2])
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not ((x == 0 and not (c & 0x10)) or (x == -1 and (c & 0x10)))
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return {"size": rle["size"], "counts": "".join(s)}


def decompress(rle: dict) -> dict:
    """Compressed string RLE -> uncompressed (COCO maskApi rleFrString)."""
    s = rle["counts"]
    native = _native.rle_from_string_native(s)
    if native is not None:
        return {"size": rle["size"], "counts": native.tolist()}
    counts = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return {"size": rle["size"], "counts": counts}


def encode(mask: np.ndarray) -> dict:
    """(H, W) binary mask -> compressed RLE (like mask_util.encode)."""
    return compress(encode_counts(mask))


def decode(rle) -> np.ndarray:
    """RLE (compressed str, uncompressed list, or polygon-free) -> mask."""
    if isinstance(rle["counts"], (str, bytes)):
        c = rle["counts"]
        if isinstance(c, bytes):
            rle = {"size": rle["size"], "counts": c.decode("ascii")}
        rle = decompress(rle)
    return decode_counts(rle)


def area(rle) -> int:
    if isinstance(rle["counts"], (str, bytes)):
        rle = decompress({"size": rle["size"],
                          "counts": rle["counts"] if isinstance(rle["counts"], str)
                          else rle["counts"].decode("ascii")})
    return int(sum(rle["counts"][1::2]))


def _to_counts(rle):
    """Any RLE form -> uncompressed counts list."""
    if isinstance(rle["counts"], (str, bytes)):
        c = rle["counts"]
        if isinstance(c, bytes):
            rle = {"size": rle["size"], "counts": c.decode("ascii")}
        rle = decompress(rle)
    return rle["counts"]


def merge(rles, intersect: bool = False) -> dict:
    """Union (or intersection) of RLE masks -> uncompressed RLE
    (pycocotools mask.merge role; used for MOTS overlap resolution)."""
    if not rles:
        raise ValueError("merge of zero masks")
    h, w = rles[0]["size"]
    counts = _native.rle_merge_native([_to_counts(r) for r in rles], h, w,
                                      intersect)
    if counts is not None:
        return {"size": [h, w], "counts": counts.tolist()}
    stack = np.stack([decode(r) for r in rles])
    m = stack.all(0) if intersect else stack.any(0)
    return encode_counts(m)


def iou_rle(d_rles, g_rles, iscrowd=None) -> np.ndarray:
    """IoU matrix between lists of RLEs.

    Native path intersects runs in the RLE domain (no dense decode);
    fallback decodes to dense pixels and matmuls."""
    if not d_rles or not g_rles:
        return np.zeros((len(d_rles), len(g_rles)))
    native = _native.rle_iou_native(
        [_to_counts(r) for r in d_rles], [_to_counts(r) for r in g_rles],
        None if iscrowd is None else np.asarray(iscrowd, np.uint8))
    if native is not None:
        return native
    d = np.stack([decode(r) for r in d_rles]).astype(np.float32)
    g = np.stack([decode(r) for r in g_rles]).astype(np.float32)
    D, G = len(d), len(g)
    d_flat = d.reshape(D, -1)
    g_flat = g.reshape(G, -1)
    inter = d_flat @ g_flat.T
    d_area = d_flat.sum(1)[:, None]
    g_area = g_flat.sum(1)[None, :]
    if iscrowd is None:
        iscrowd = np.zeros(G, bool)
    union = np.where(np.asarray(iscrowd, bool)[None, :], d_area,
                     d_area + g_area - inter)
    return inter / np.maximum(union, 1e-12)
