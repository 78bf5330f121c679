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
        imgs = [cv2.imread(p) for p in frames[1:]]
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
    mask0 = cv2.imread(seq.masks[0], cv2.IMREAD_GRAYSCALE)
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
            anno = cv2.imread(anno_by_name[name], cv2.IMREAD_GRAYSCALE)
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


def run_dataset_sot_parallel(driver, sequences, mesh, axis: str = "seq",
                             result_dir=None, max_seqs=None, verbose=True):
    """Lockstep multi-sequence SOT over a device mesh: S = mesh size
    sequences advance one frame per jitted step, their reference states
    stacked and sharded over `axis` (drivers/seq_parallel.py). Retired
    slots immediately pull the next sequence from the queue, so all chips
    stay busy until the tail.

    Replaces the reference's one-process-per-GPU sequence pool
    (external/lib/test/evaluation/running.py:176-203) with the TPU-native
    form: one program, zero cross-chip traffic, identical per-sequence
    protocol (the host state carry is SOTDriver.update_state_from_packed,
    byte-shared with the sequential path).

    driver: ONE SOTDriver (model/params shared across slots).
    Returns {seq.name: boxes (N, 4) xywh} like run_dataset_sot.
    """
    import jax.numpy as jnp

    from ..drivers.seq_parallel import make_sot_seq_parallel_fn

    S = mesh.shape[axis]
    fn = make_sot_seq_parallel_fn(driver, mesh, axis=axis)
    n = len(sequences) if max_seqs is None else min(max_seqs, len(sequences))
    queue = list(range(n))
    slots = [None] * S  # per-slot dict or None
    results = {}
    t0 = time.time()
    n_frames_done = 0

    def load_next(slot_idx):
        if not queue:
            return None
        seq = sequences[queue.pop(0)]
        img0 = cv2.imread(seq.frames[0])
        assert img0 is not None, seq.frames[0]
        frame0, r = driver._preproc(img0)
        x, y, w, h = seq.init_bbox
        box = np.array([[(x + w / 2) * r, (y + h / 2) * r, w * r, h * r]],
                       np.float32)
        feat_ref, lbs_ref = driver._init_fn(driver.params, frame0,
                                            jnp.asarray(box))
        return {"seq": seq, "feat_ref": feat_ref, "lbs_ref": lbs_ref,
                "r": r, "cursor": 1, "state": list(seq.init_bbox),
                "boxes": [list(seq.init_bbox)]}

    for i in range(S):
        slots[i] = load_next(i)

    while any(s is not None for s in slots):
        frames, rs = [], []
        live = []
        for i, s in enumerate(slots):
            if s is None:
                # dead slot: feed a zero frame (results discarded)
                frames.append(np.zeros(driver.input_size + (3,), np.uint8))
                rs.append(1.0)
                continue
            img = cv2.imread(s["seq"].frames[s["cursor"]])
            f, r = driver._preproc_u8(img)
            frames.append(np.asarray(f[0]))
            rs.append(r)
            live.append(i)
        if not live:
            break
        # dead slots reuse a live slot's refs; their outputs are discarded
        filler = slots[live[0]]
        feat_refs = jnp.stack([(s or filler)["feat_ref"] for s in slots])
        lbs_refs = jnp.stack([(s or filler)["lbs_ref"] for s in slots])
        packed = np.asarray(fn(driver.params, feat_refs, lbs_refs,
                               jnp.asarray(np.stack(frames))))
        for i in live:
            s = slots[i]
            s["state"] = driver.update_state_from_packed(
                packed[i], s["r"], s["state"], driver.input_size)
            s["boxes"].append(list(s["state"]))
            s["cursor"] += 1
            n_frames_done += 1
            if s["cursor"] >= len(s["seq"].frames):
                boxes = np.asarray(s["boxes"], np.float64)
                results[s["seq"].name] = boxes
                if result_dir:
                    os.makedirs(result_dir, exist_ok=True)
                    np.savetxt(os.path.join(result_dir,
                                            f"{s['seq'].name}.txt"),
                               boxes, delimiter="\t", fmt="%d")
                if verbose:
                    print(f"[{len(results)}/{n}] {s['seq'].name}: "
                          f"{len(boxes)} frames")
                slots[i] = load_next(i)
    if verbose:
        dt = max(time.time() - t0, 1e-9)
        print(f"parallel SOT: {n} seqs, {n_frames_done} frames, "
              f"{n_frames_done / dt:.1f} FPS aggregate over {S} slots")
    return results


def run_dataset_vos_parallel(driver, sequences, mesh, axis: str = "seq",
                             result_dir=None, max_seqs=None, verbose=True):
    """Lockstep multi-sequence VOS over a device mesh (DAVIS-style
    sequences: all objects annotated on frame 0). S = mesh size sequences
    advance one frame per jitted step via
    drivers/seq_parallel.make_vos_seq_parallel_fn; per-sequence host state
    lives in shallow driver copies sharing ONE set of jitted fns, and the
    scored aggregation is VOSDriver.postprocess_masks_host — byte-shared
    with the sequential path.

    Sequences with mid-video annotated frames (YouTube-VOS object entries)
    fall back to the sequential run_sequence_vos — their per-slot reference
    updates would force a host round-trip anyway.

    Returns {seq.name: [indexed masks]} like repeated run_sequence_vos.
    """
    import copy

    import jax.numpy as jnp

    from ..drivers.seq_parallel import make_vos_seq_parallel_fn

    S = mesh.shape[axis]
    fn = make_vos_seq_parallel_fn(driver, mesh, axis=axis)
    n = len(sequences) if max_seqs is None else min(max_seqs, len(sequences))
    parallel_idx, sequential_idx = [], []
    for i in range(n):
        if (sequences[i].masks or [])[1:]:
            sequential_idx.append(i)
        else:
            parallel_idx.append(i)

    results = {}
    queue = list(parallel_idx)
    slots = [None] * S
    t0 = time.time()
    n_frames_done = 0

    def load_next():
        if not queue:
            return None
        seq = sequences[queue.pop(0)]
        img0 = cv2.imread(seq.frames[0])
        mask0 = cv2.imread(seq.masks[0], cv2.IMREAD_GRAYSCALE)
        drv = copy.copy(driver)  # shares jitted fns; fresh per-seq state
        drv.initialize(img0, mask0)
        _, r = drv._preproc(img0)
        return {"seq": seq, "drv": drv, "r": r, "cursor": 1,
                "masks": [mask0]}

    for i in range(S):
        slots[i] = load_next()

    while any(s is not None for s in slots):
        live = [i for i, s in enumerate(slots) if s is not None]
        if not live:
            break
        filler = slots[live[0]]
        frames = []
        for s in slots:
            src = s or filler
            img = cv2.imread(src["seq"].frames[min(
                src["cursor"], len(src["seq"].frames) - 1)])
            f, _ = src["drv"]._preproc(img)
            frames.append(np.asarray(f[0]))
        feat_refs = jnp.stack([(s or filler)["drv"].feat_ref for s in slots])
        lbs_refs = jnp.stack([(s or filler)["drv"].lbs_ref for s in slots])
        dets, valid, masks = fn(driver.params, feat_refs, lbs_refs,
                                jnp.asarray(np.stack(frames)))
        dets, valid, masks = (np.asarray(dets), np.asarray(valid),
                              np.asarray(masks) if masks is not None else None)
        for i in live:
            s = slots[i]
            m_i = masks[i] if masks is not None else None
            out, _ = s["drv"].postprocess_masks_host(
                dets[i], valid[i], m_i, s["r"])
            s["masks"].append(out if out is not None
                              else np.zeros_like(s["masks"][0]))
            s["cursor"] += 1
            n_frames_done += 1
            if s["cursor"] >= len(s["seq"].frames):
                results[s["seq"].name] = s["masks"]
                if result_dir:
                    out_dir = os.path.join(result_dir, s["seq"].name)
                    os.makedirs(out_dir, exist_ok=True)
                    for path, m in zip(s["seq"].frames, s["masks"]):
                        name = os.path.splitext(
                            os.path.basename(path))[0] + ".png"
                        cv2.imwrite(os.path.join(out_dir, name),
                                    m.astype(np.uint8))
                if verbose:
                    print(f"[{len(results)}/{n}] {s['seq'].name}: "
                          f"{len(s['masks'])} frames")
                slots[i] = load_next()

    for i in sequential_idx:
        seq = sequences[i]
        drv = copy.copy(driver)
        results[seq.name] = run_sequence_vos(drv, seq, result_dir)
        if verbose:
            print(f"[{len(results)}/{n}] {seq.name} (sequential: "
                  f"mid-video entries)")
    if verbose:
        dt = max(time.time() - t0, 1e-9)
        print(f"parallel VOS: {n} seqs, {n_frames_done} lockstep frames, "
              f"{n_frames_done / dt:.1f} FPS aggregate over {S} slots")
    return results
