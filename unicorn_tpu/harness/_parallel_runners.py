"""Lockstep multi-sequence SOT/VOS dataset runners over a device mesh.

Split out of running.py for readability; re-exported there. Replaces the
reference's one-process-per-GPU sequence pool
(external/lib/test/evaluation/running.py:176-203) with the TPU-native form:
S sequences advance one frame per jitted step, their per-sequence carry
states stacked and sharded over a "seq" mesh axis
(drivers/seq_parallel.py). Retired slots immediately pull the next sequence
from the queue so all chips stay busy until the tail; the per-sequence host
protocol logic is byte-shared with the sequential runners
(SOTDriver.update_state_from_packed / VOSDriver.postprocess_masks_host).
"""
from __future__ import annotations

import os
import time

import cv2
import numpy as np

from ..utils.label_ops import read_indexed_mask


class _RefStackCache:
    """Stacked per-slot reference tensors, rebuilt only when a slot
    changes (references are constant between slot refills)."""

    def __init__(self):
        self.dirty = True
        self.stacks = None

    def get(self, build):
        if self.dirty:
            self.stacks = build()
            self.dirty = False
        return self.stacks


def run_dataset_sot_parallel(driver, sequences, mesh, axis: str = "seq",
                             result_dir=None, max_seqs=None, verbose=True):
    """Lockstep multi-sequence SOT. driver: ONE SOTDriver (model/params
    shared across slots). Returns {seq.name: boxes (N, 4) xywh} like
    run_dataset_sot."""
    import jax.numpy as jnp

    from ..drivers.seq_parallel import make_sot_seq_parallel_fn

    S = mesh.shape[axis]
    fn = make_sot_seq_parallel_fn(driver, mesh, axis=axis)
    n = len(sequences) if max_seqs is None else min(max_seqs, len(sequences))
    queue = list(range(n))
    slots = [None] * S
    cache = _RefStackCache()
    results = {}
    t0 = time.time()
    n_frames_done = 0

    def finish(seq, boxes):
        boxes = np.asarray(boxes, np.float64)
        results[seq.name] = boxes
        if result_dir:
            os.makedirs(result_dir, exist_ok=True)
            np.savetxt(os.path.join(result_dir, f"{seq.name}.txt"),
                       boxes, delimiter="\t", fmt="%d")
        if verbose:
            print(f"[{len(results)}/{n}] {seq.name}: {len(boxes)} frames")

    def load_next():
        while queue:
            seq = sequences[queue.pop(0)]
            if len(seq.frames) <= 1:
                # nothing to track beyond the init frame
                finish(seq, [list(seq.init_bbox)])
                continue
            img0 = cv2.imread(seq.frames[0])
            assert img0 is not None, seq.frames[0]
            frame0, r = driver._preproc(img0)
            x, y, w, h = seq.init_bbox
            box = np.array(
                [[(x + w / 2) * r, (y + h / 2) * r, w * r, h * r]],
                np.float32)
            feat_ref, lbs_ref = driver._init_fn(driver.params, frame0,
                                                jnp.asarray(box))
            return {"seq": seq, "feat_ref": feat_ref, "lbs_ref": lbs_ref,
                    "r": r, "cursor": 1, "state": list(seq.init_bbox),
                    "boxes": [list(seq.init_bbox)]}
        return None

    for i in range(S):
        slots[i] = load_next()
    cache.dirty = True
    zero_frame = np.zeros(driver.input_size + (3,), np.uint8)

    while any(s is not None for s in slots):
        live = [i for i, s in enumerate(slots) if s is not None]
        if not live:
            break
        frames = []
        for s in slots:
            if s is None:
                frames.append(zero_frame)  # dead slot: output discarded
                continue
            img = cv2.imread(s["seq"].frames[s["cursor"]])
            f, _ = driver._preproc_u8(img)
            frames.append(np.asarray(f[0]))
        filler = slots[live[0]]
        feat_refs, lbs_refs = cache.get(lambda: (
            jnp.stack([(s or filler)["feat_ref"] for s in slots]),
            jnp.stack([(s or filler)["lbs_ref"] for s in slots]),
        ))
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
                finish(s["seq"], s["boxes"])
                slots[i] = load_next()
                cache.dirty = True
    if verbose:
        dt = max(time.time() - t0, 1e-9)
        print(f"parallel SOT: {n} seqs, {n_frames_done} frames, "
              f"{n_frames_done / dt:.1f} FPS aggregate over {S} slots")
    return results


def _introduces_new_ids(seq):
    """True when a later annotated mask contains object ids absent from the
    frame-0 annotation (YouTube-VOS mid-video entry -> needs the sequential
    add_objects protocol). Merely HAVING later masks (DAVIS ships one gt
    per frame) does not disqualify a sequence from lockstep."""
    later = (seq.masks or [])[1:]
    if not later:
        return False
    m0 = read_indexed_mask(seq.masks[0])
    ids0 = set(np.unique(m0)) - {0}
    for mp in later:
        m = read_indexed_mask(mp)
        if (set(np.unique(m)) - {0}) - ids0:
            return True
    return False


def run_dataset_vos_parallel(driver, sequences, mesh, axis: str = "seq",
                             result_dir=None, max_seqs=None, verbose=True):
    """Lockstep multi-sequence VOS. Sequences whose later annotated frames
    introduce NEW object ids (YouTube-VOS entries) fall back to the
    sequential run_sequence_vos; everything else (incl. DAVIS, which ships
    a gt mask per frame but all objects on frame 0) runs in lockstep via
    the shared-reference seq-parallel fn — ONE interaction + ONE K-row
    correlation per sequence per frame.

    Returns {seq.name: [indexed masks]} like repeated run_sequence_vos.
    """
    import copy

    import jax.numpy as jnp

    from ..drivers.seq_parallel import make_vos_shared_seq_parallel_fn

    from .running import run_sequence_vos

    S = mesh.shape[axis]
    fn = make_vos_shared_seq_parallel_fn(driver, mesh, axis=axis)
    n = len(sequences) if max_seqs is None else min(max_seqs, len(sequences))
    parallel_idx, sequential_idx = [], []
    for i in range(n):
        (sequential_idx if _introduces_new_ids(sequences[i])
         else parallel_idx).append(i)

    results = {}
    queue = list(parallel_idx)
    slots = [None] * S
    cache = _RefStackCache()
    t0 = time.time()
    n_frames_done = 0

    def write_out(seq, masks):
        results[seq.name] = masks
        if result_dir:
            out_dir = os.path.join(result_dir, seq.name)
            os.makedirs(out_dir, exist_ok=True)
            for path, m in zip(seq.frames, masks):
                name = os.path.splitext(os.path.basename(path))[0] + ".png"
                cv2.imwrite(os.path.join(out_dir, name), m.astype(np.uint8))
        if verbose:
            print(f"[{len(results)}/{n}] {seq.name}: {len(masks)} frames")

    def load_next():
        while queue:
            seq = sequences[queue.pop(0)]
            mask0 = read_indexed_mask(seq.masks[0])
            if len(seq.frames) <= 1:
                write_out(seq, [mask0])
                continue
            img0 = cv2.imread(seq.frames[0])
            drv = copy.copy(driver)  # shares jitted fns; fresh state
            drv.initialize(img0, mask0)
            _, r = drv._preproc(img0)
            return {"seq": seq, "drv": drv, "r": r, "cursor": 1,
                    "masks": [mask0]}
        return None

    for i in range(S):
        slots[i] = load_next()
    cache.dirty = True
    zero_frame = np.zeros(driver.input_size + (3,), np.float32)

    while any(s is not None for s in slots):
        live = [i for i, s in enumerate(slots) if s is not None]
        if not live:
            break
        frames = []
        for s in slots:
            if s is None:
                frames.append(zero_frame)
                continue
            img = cv2.imread(s["seq"].frames[s["cursor"]])
            f, _ = s["drv"]._preproc(img)
            frames.append(np.asarray(f[0]))
        filler = slots[live[0]]
        feat_ref1s, lbs_refs = cache.get(lambda: (
            jnp.stack([(s or filler)["drv"].feat_ref1 for s in slots]),
            jnp.stack([(s or filler)["drv"].lbs_ref for s in slots]),
        ))
        dets, valid, masks = fn(driver.params, feat_ref1s, lbs_refs,
                                jnp.asarray(np.stack(frames)))
        dets, valid = np.asarray(dets), np.asarray(valid)
        masks = np.asarray(masks) if masks is not None else None
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
                write_out(s["seq"], s["masks"])
                slots[i] = load_next()
                cache.dirty = True

    for i in sequential_idx:
        seq = sequences[i]
        drv = copy.copy(driver)
        results[seq.name] = run_sequence_vos(drv, seq, result_dir)
        if verbose:
            print(f"[{len(results)}/{n}] {seq.name} (sequential: "
                  f"mid-video object entries)")
    if verbose:
        dt = max(time.time() - t0, 1e-9)
        print(f"parallel VOS: {n} seqs, {n_frames_done} lockstep frames, "
              f"{n_frames_done / dt:.1f} FPS aggregate over {S} slots")
    return results
