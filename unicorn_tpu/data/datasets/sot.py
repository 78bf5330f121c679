"""SOT video datasets: LaSOT / GOT-10k / TrackingNet / COCO-SOT.

Reference: unicorn/data/datasets/{lasot,got10k,tracking_net,coco_sot}.py.
Each dataset exposes `pull_item_omni(seq_id, num_frames)` returning
num_frames of (HWC uint8 img, (1, 5) [xyxy, cls=0]) sampled from one video
(COCO-SOT duplicates a static image, coco_sot.py:182-219).
"""
from __future__ import annotations

import os
import random

import cv2
import numpy as np


def _read_img(path):
    img = cv2.imread(path)
    assert img is not None, f"file {path} not found"
    return img


def _clip_box(box_xywh, h, w):
    x, y, bw, bh = box_xywh
    x1 = max(0.0, x)
    y1 = max(0.0, y)
    x2 = min(w, x + max(bw, 1.0))
    y2 = min(h, y + max(bh, 1.0))
    return np.asarray([[x1, y1, x2, y2, 0.0]], np.float32)


class SequenceSOTBase:
    """Shared frame-pair sampling: pick 2 frames within max_gap.

    The reference samples pairs uniformly over the WHOLE sequence with no gap
    limit (lasot.py:192 `random.sample(valid_ids, num_frames)`); max_gap here
    is a stricter temporal-locality window, measured in FRAME-ID units so
    occluded/absent stretches don't silently widen it (the same unit contract
    as MOTSVideoDataset, vos.py)."""

    max_gap = 200

    def __len__(self):
        return len(self.sequences)

    def _sample_pair(self, n_frames_avail, num_frames):
        """Dense case: list index == frame id (TrackingNet, COCOSOT)."""
        if n_frames_avail == 1:
            return [0] * num_frames
        a = random.randint(0, n_frames_avail - 1)
        lo = max(0, a - self.max_gap)
        hi = min(n_frames_avail - 1, a + self.max_gap)
        b = random.randint(lo, hi)
        return [a, b][:num_frames]

    def _sample_pair_ids(self, frame_ids, num_frames):
        """Sparse case: `frame_ids` is the sorted array of sample-able frame
        ids (visible frames). Returns POSITIONS into frame_ids whose frame-id
        distance is <= max_gap — list-index distance would let a 2000-frame
        occlusion gap pair template/search frames from different scene
        states."""
        n = len(frame_ids)
        if n == 1:
            return [0] * num_frames
        a = random.randint(0, n - 1)
        fa = int(frame_ids[a])
        lo = int(np.searchsorted(frame_ids, fa - self.max_gap, side="left"))
        hi = int(np.searchsorted(frame_ids, fa + self.max_gap, side="right")) - 1
        b = random.randint(lo, hi)
        return [a, b][:num_frames]


class Lasot(SequenceSOTBase):
    """LaSOT train split (reference lasot.py:13-243). Layout:
    root/<class>/<class>-<idx>/img/*.jpg + groundtruth.txt (x,y,w,h)."""

    def __init__(self, root, split_ids=None, max_gap=200):
        self.root = root
        self.max_gap = max_gap
        self._info_cache: dict = {}
        self.sequences = []
        if os.path.isdir(root):
            for cls in sorted(os.listdir(root)):
                cdir = os.path.join(root, cls)
                if not os.path.isdir(cdir):
                    continue
                for seq in sorted(os.listdir(cdir)):
                    if seq.startswith(cls + "-"):
                        self.sequences.append(os.path.join(cdir, seq))

    def _seq_info(self, seq_id):
        """Cached (gt, vis_idx): the annotation files are immutable, and
        re-parsing three loadtxt files per training sample (tens of ms on a
        long sequence) would dominate the sampler."""
        cached = self._info_cache.get(seq_id)
        if cached is not None:
            return cached
        seq_dir = self.sequences[seq_id]
        gt = np.loadtxt(os.path.join(seq_dir, "groundtruth.txt"),
                        delimiter=",").astype(np.float32)
        # occlusion/out-of-view filtering (lasot.py visible logic)
        occ = np.loadtxt(os.path.join(seq_dir, "full_occlusion.txt"), delimiter=",") \
            if os.path.exists(os.path.join(seq_dir, "full_occlusion.txt")) else None
        oov = np.loadtxt(os.path.join(seq_dir, "out_of_view.txt"), delimiter=",") \
            if os.path.exists(os.path.join(seq_dir, "out_of_view.txt")) else None
        visible = (gt[:, 2] > 0) & (gt[:, 3] > 0)
        if occ is not None:
            visible &= occ == 0
        if oov is not None:
            visible &= oov == 0
        vis_idx = np.flatnonzero(visible)
        if len(vis_idx) == 0:
            vis_idx = np.arange(len(gt))
        self._info_cache[seq_id] = (gt, vis_idx)
        return gt, vis_idx

    def pull_item_omni(self, seq_id, num_frames=2):
        seq_dir = self.sequences[seq_id]
        gt, vis_idx = self._seq_info(seq_id)
        frames = []
        ids = self._sample_pair_ids(vis_idx, num_frames)
        for i in ids:
            fi = int(vis_idx[i])
            img = _read_img(os.path.join(seq_dir, "img", f"{fi + 1:08d}.jpg"))
            res = _clip_box(gt[fi], img.shape[0], img.shape[1])
            frames.append((img, res))
        return frames


class Got10k(SequenceSOTBase):
    """GOT-10k train split (got10k.py). Layout: root/GOT-10k_Train_XXXXXX/
    {*.jpg, groundtruth.txt, absence.label}."""

    def __init__(self, root, max_gap=200):
        self.root = root
        self.max_gap = max_gap
        self._info_cache: dict = {}
        self.sequences = []
        if os.path.isdir(root):
            list_file = os.path.join(root, "list.txt")
            if os.path.exists(list_file):
                with open(list_file) as f:
                    self.sequences = [
                        os.path.join(root, l.strip()) for l in f if l.strip()
                    ]
            else:
                self.sequences = [
                    os.path.join(root, d) for d in sorted(os.listdir(root))
                    if os.path.isdir(os.path.join(root, d))
                ]

    def _seq_info(self, seq_id):
        """Cached (gt, vis_idx) — see Lasot._seq_info."""
        cached = self._info_cache.get(seq_id)
        if cached is not None:
            return cached
        seq_dir = self.sequences[seq_id]
        gt = np.loadtxt(os.path.join(seq_dir, "groundtruth.txt"),
                        delimiter=",").reshape(-1, 4).astype(np.float32)
        absence_f = os.path.join(seq_dir, "absence.label")
        visible = (gt[:, 2] > 0) & (gt[:, 3] > 0)
        if os.path.exists(absence_f):
            absence = np.loadtxt(absence_f)
            visible &= absence == 0
        vis_idx = np.flatnonzero(visible)
        if len(vis_idx) == 0:
            vis_idx = np.arange(len(gt))
        self._info_cache[seq_id] = (gt, vis_idx)
        return gt, vis_idx

    def pull_item_omni(self, seq_id, num_frames=2):
        seq_dir = self.sequences[seq_id]
        gt, vis_idx = self._seq_info(seq_id)
        frames = []
        for i in self._sample_pair_ids(vis_idx, num_frames):
            fi = int(vis_idx[i])
            img = _read_img(os.path.join(seq_dir, f"{fi + 1:08d}.jpg"))
            frames.append((img, _clip_box(gt[fi], img.shape[0], img.shape[1])))
        return frames


class TrackingNet(SequenceSOTBase):
    """TrackingNet train chunks (tracking_net.py). Layout:
    root/TRAIN_k/frames/<seq>/<i>.jpg + anno/<seq>.txt."""

    def __init__(self, root, set_ids=range(12), max_gap=200):
        self.root = root
        self.max_gap = max_gap
        self._info_cache: dict = {}
        self.sequences = []  # (chunk_dir, seq_name)
        for k in set_ids:
            anno_dir = os.path.join(root, f"TRAIN_{k}", "anno")
            if not os.path.isdir(anno_dir):
                continue
            for f in sorted(os.listdir(anno_dir)):
                if f.endswith(".txt"):
                    self.sequences.append((os.path.join(root, f"TRAIN_{k}"), f[:-4]))

    def pull_item_omni(self, seq_id, num_frames=2):
        chunk, name = self.sequences[seq_id]
        gt = self._info_cache.get(seq_id)
        if gt is None:
            gt = np.loadtxt(os.path.join(chunk, "anno", name + ".txt"),
                            delimiter=",").reshape(-1, 4).astype(np.float32)
            self._info_cache[seq_id] = gt
        frames = []
        for i in self._sample_pair(len(gt), num_frames):
            img = _read_img(os.path.join(chunk, "frames", name, f"{i}.jpg"))
            frames.append((img, _clip_box(gt[i], img.shape[0], img.shape[1])))
        return frames


class COCOSOT(SequenceSOTBase):
    """Static-image SOT: one random instance of a COCO image duplicated as a
    2-frame 'video' (coco_sot.py:182-219)."""

    def __init__(self, coco_dataset):
        self.ds = coco_dataset
        # keep only images with at least one box
        self.sequences = [
            i for i in range(len(coco_dataset))
            if len(coco_dataset.annotations[i][0]) > 0
        ]

    def pull_item_omni(self, seq_id, num_frames=2):
        idx = self.sequences[seq_id]
        img, res, _, _ = self.ds.pull_item(idx)
        k = random.randint(0, len(res) - 1)
        box = res[k: k + 1].copy()
        box[:, 4] = 0.0  # class forced to 0 for SOT
        # Per-frame copies: the HSV augment mutates images in place
        # (transforms.py augment_hsv), so a shared array would compound the
        # jitter of frame 1 into frame 2 instead of jittering each frame
        # from the same base (siblings mot.py/vos.py already copy per frame).
        return [(img if i == 0 else img.copy(), box.copy())
                for i in range(num_frames)]
