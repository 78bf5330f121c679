"""Sequence/dataset runners for SOT & VOS evaluation.

Reference: external/lib/test/evaluation/running.py:176-203 and
tracker.py:70-212. The reference shards sequences over a multiprocessing pool
with one GPU each; here a single chip streams sequences (the multi-stream
driver can shard them over a mesh axis instead).
"""
from __future__ import annotations

import os
import time

import cv2
import numpy as np

from ..utils.label_ops import read_indexed_mask
from .datasets import Sequence


def run_sequence_sot(driver, seq: Sequence, result_dir: str | None = None,
                     window: int = 8):
    """Run one SOT sequence; returns (boxes (N, 4) xywh, fps).

    Uses the driver's batched `track_window` when available (SOT per-frame
    compute is reference-state-only, so windows batch losslessly)."""
    frames = seq.frames
    img0 = cv2.imread(frames[0])
    assert img0 is not None, frames[0]
    driver.initialize(img0, seq.init_bbox)
    boxes = [seq.init_bbox]
    t0 = time.time()
    if hasattr(driver, "track_window") and window > 1:
        # decode per window chunk: LaSOT sequences run to ~10k frames, so
        # decoding the whole video up front would hold tens of GB of raw
        # frames; memory stays bounded at window * frame_size this way
        for start in range(1, len(frames), window):
            imgs = [cv2.imread(p) for p in frames[start: start + window]]
            outs = driver.track_window(imgs, window=window)
            boxes.extend(o["target_bbox"] for o in outs)
    else:
        for path in frames[1:]:
            img = cv2.imread(path)
            out = driver.track(img)
            boxes.append(out["target_bbox"])
    fps = max(len(frames) - 1, 1) / max(time.time() - t0, 1e-9)
    boxes = np.asarray(boxes, np.float64)
    if result_dir:
        os.makedirs(result_dir, exist_ok=True)
        np.savetxt(os.path.join(result_dir, f"{seq.name}.txt"), boxes,
                   delimiter="\t", fmt="%d")
    return boxes, fps


def run_dataset_sot(driver_factory, sequences, result_dir=None, max_seqs=None,
                    verbose=True):
    """driver_factory() -> fresh SOTDriver per sequence."""
    results = {}
    n = len(sequences) if max_seqs is None else min(max_seqs, len(sequences))
    for i in range(n):
        seq = sequences[i]
        driver = driver_factory()
        boxes, fps = run_sequence_sot(driver, seq, result_dir)
        results[seq.name] = boxes
        if verbose:
            print(f"[{i + 1}/{n}] {seq.name}: {len(boxes)} frames, {fps:.1f} FPS")
    return results


def run_sequence_vos(driver, seq: Sequence, result_dir: str | None = None):
    """Run one VOS sequence from its first-frame annotation; writes indexed
    PNGs (the DAVIS submission format) when result_dir is given.

    YouTube-VOS style mid-video entries: when a later annotated frame
    (seq.masks beyond index 0, aligned to seq.frames by name) introduces new
    object ids, they are registered via driver.add_objects with that frame as
    their reference (reference unicorn_vos.py:86-101)."""
    img0 = cv2.imread(seq.frames[0])
    mask0 = read_indexed_mask(seq.masks[0])
    driver.initialize(img0, mask0)
    # annotated frames after the first may introduce new objects
    anno_by_name = {}
    for mp in (seq.masks or [])[1:]:
        anno_by_name[os.path.splitext(os.path.basename(mp))[0]] = mp
    masks = [mask0]
    for path in seq.frames[1:]:
        img = cv2.imread(path)
        name = os.path.splitext(os.path.basename(path))[0]
        if name in anno_by_name and hasattr(driver, "add_objects"):
            anno = read_indexed_mask(anno_by_name[name])
            driver.add_objects(img, anno)
        mask, _ = driver.track(img)
        masks.append(mask if mask is not None else np.zeros_like(mask0))
    if result_dir:
        out_dir = os.path.join(result_dir, seq.name)
        os.makedirs(out_dir, exist_ok=True)
        for path, m in zip(seq.frames, masks):
            name = os.path.splitext(os.path.basename(path))[0] + ".png"
            cv2.imwrite(os.path.join(out_dir, name), m.astype(np.uint8))
    return masks


# Lockstep multi-sequence runners live in _parallel_runners.py;
# re-exported here as part of the running API.
from ._parallel_runners import (  # noqa: E402
    run_dataset_sot_parallel,
    run_dataset_vos_parallel,
)
