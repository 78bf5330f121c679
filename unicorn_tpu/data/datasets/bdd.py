"""BDD100K datasets: native scalabel-json loaders for MOT (box_track_20) and
MOTS (seg_track_20), 2-frame omni training sampling, and the per-video eval
dataset.

Reference behavior anchors: unicorn/data/datasets/bdd_omni.py:15-141 (2-frame
sampling with cross-frame track-id matching) and bdd_omni_mots.py:15-143 (the
MOTS variant). The reference routes BDD through the vendored mmdet/qdtrack
stack; here the scalabel format — BDD's native annotation schema: one json per
split (or one per video) holding frames with `videoName`, `frameIndex`,
`name`, and `labels` [{id, category, box2d{x1,y1,x2,y2}[, rle]}] — is parsed
directly.

Layout expected under `data_dir` (the official bdd100k download layout):
  images/track/{split}/{videoName}/{frame name}.jpg
  labels/box_track_20/{split}.json        (or {split}/ per-video jsons)
  labels/seg_track_20/rles/{split}.json   (MOTS, rle-carrying labels)
"""
from __future__ import annotations

import json
import os
import random
from collections import defaultdict

import cv2
import numpy as np

# the 8 scored classes of the BDD100K MOT/MOTS benchmark, in official order
BDD_CLASSES = ("pedestrian", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")
# annotated but unscored categories (scalabel eval treats them as ignore)
BDD_IGNORE = ("other person", "other vehicle", "trailer")
_CLS_INDEX = {c: i for i, c in enumerate(BDD_CLASSES)}


def load_scalabel(path):
    """Load scalabel frames from a json file or a directory of per-video
    jsons. Returns {videoName: [frame, ...]} with frames sorted by
    frameIndex; each frame keeps its raw scalabel dict."""
    if os.path.isdir(path):
        frames = []
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".json"):
                frames.extend(json.load(open(os.path.join(path, fn))))
    else:
        frames = json.load(open(path))
        if isinstance(frames, dict) and "frames" in frames:
            frames = frames["frames"]
    videos = defaultdict(list)
    for f in frames:
        videos[f.get("videoName") or f["name"].rsplit("-", 1)[0]].append(f)
    for v in videos.values():
        v.sort(key=lambda f: f.get("frameIndex", 0))
    return dict(videos)


def parse_labels(frame, with_rle=False):
    """Scalabel frame -> (res (N, 6) [x1,y1,x2,y2,cls,tid], rles|None).

    Crowd boxes and unscored categories are dropped (the scalabel protocol
    ignores them); track ids are scalabel label ids (stable across frames).
    """
    objs, rles = [], []
    for lab in frame.get("labels") or []:
        cat = lab.get("category")
        if cat not in _CLS_INDEX:
            continue
        attrs = lab.get("attributes") or {}
        if attrs.get("crowd", False):
            continue
        box = lab.get("box2d")
        rle = lab.get("rle") if with_rle else None
        if box is None and rle is None:
            continue
        if box is None:
            # MOTS labels may carry only the rle; derive the box from it
            from ...evaluators import rle as rle_codec

            m = rle_codec.decode(rle)
            ys, xs = np.nonzero(m)
            if len(xs) == 0:
                continue
            box = {"x1": xs.min(), "y1": ys.min(),
                   "x2": xs.max() + 1, "y2": ys.max() + 1}
        objs.append([box["x1"], box["y1"], box["x2"], box["y2"],
                     _CLS_INDEX[cat], int(lab["id"])])
        if with_rle:
            rles.append(rle)
    res = np.asarray(objs, np.float32).reshape(-1, 6)
    return (res, rles) if with_rle else (res, None)


def _read_img(path):
    img = cv2.imread(path)
    assert img is not None, f"file {path} not found"
    return img


class BDDOmniDataset:
    """2-frame BDD MOT training sampling (bdd_omni.py:15-141 semantics).

    pull_item_omni returns [(img, res (N,6)), (img2, res2)] — same protocol
    as MOTOmniDataset, with track ids consistent across the two frames.
    """

    num_classes = len(BDD_CLASSES)

    def __init__(self, data_dir, split="train", max_gap=3, label_path=None,
                 img_root=None):
        self.data_dir = data_dir
        self.split = split
        self.img_root = img_root or os.path.join(
            data_dir, "images", "track", split)
        label_path = label_path or self._default_labels(data_dir, split)
        self.videos = load_scalabel(label_path)
        self.index = [(v, i) for v, frames in sorted(self.videos.items())
                      for i in range(len(frames))]
        self.max_gap = max_gap

    @staticmethod
    def _default_labels(data_dir, split):
        base = os.path.join(data_dir, "labels", "box_track_20")
        f = base + f"/{split}.json"
        return f if os.path.exists(f) else os.path.join(base, split)

    def __len__(self):
        return len(self.index)

    def _load_frame(self, video, i):
        frame = self.videos[video][i]
        img = _read_img(os.path.join(self.img_root, video, frame["name"]))
        res, _ = parse_labels(frame)
        return img, res

    def pull_item_omni(self, seq_id, num_frames=2):
        video, i = self.index[seq_id % len(self.index)]
        frames = self.videos[video]
        lo = max(0, i - self.max_gap)
        hi = min(len(frames) - 1, i + self.max_gap)
        j = random.randint(lo, hi)
        out = [self._load_frame(video, i)]
        for _ in range(num_frames - 1):
            out.append(self._load_frame(video, j))
        return out


class BDDOmniMOTSDataset(BDDOmniDataset):
    """MOTS variant (bdd_omni_mots.py:15-143): adds per-instance masks
    decoded from the seg_track_20 rles. pull_item_omni returns
    [(img, res (N,6), masks (H,W,N)), ...]."""

    @staticmethod
    def _default_labels(data_dir, split):
        base = os.path.join(data_dir, "labels", "seg_track_20", "rles")
        f = base + f"/{split}.json"
        return f if os.path.exists(f) else os.path.join(base, split)

    def _load_frame(self, video, i):
        from ...evaluators import rle as rle_codec

        frame = self.videos[video][i]
        img = _read_img(os.path.join(self.img_root, video, frame["name"]))
        res, rles = parse_labels(frame, with_rle=True)
        # Drop instances that carry a box but no rle (box_track-style labels
        # mixed into a MOTS run): keeping the row with an all-zero mask would
        # supervise the mask head TOWARD empty masks for real visible objects.
        has_rle = np.asarray([r is not None for r in rles], bool)
        if len(res) and not has_rle.all():
            res = res[has_rle]
            rles = [r for r in rles if r is not None]
        h, w = img.shape[:2]
        if len(res) == 0:
            return img, res, np.zeros((h, w, 0), np.uint8)
        masks = np.stack([rle_codec.decode(r) for r in rles], axis=2)
        return img, res, masks


class BDDEvalDataset:
    """Frame-ordered BDD eval dataset (val/test split), compatible with
    BDDEvaluator: pull_item(i) -> (img, res (N,5), info, img_id) with
    info = (h, w, frame_index, video_id, "videoName/name")."""

    def __init__(self, data_dir, split="val", label_path=None, img_root=None,
                 img_size=(800, 1440), preproc=None):
        self.data_dir = data_dir
        self.split = split
        self.img_root = img_root or os.path.join(
            data_dir, "images", "track", split)
        label_path = label_path or BDDOmniDataset._default_labels(
            data_dir, split)
        self.videos = load_scalabel(label_path)
        self.video_names = sorted(self.videos)
        self.index = [(v, i) for v in self.video_names
                      for i in range(len(self.videos[v]))]
        self.img_size = img_size
        self.preproc = preproc

    def __len__(self):
        return len(self.index)

    def gt_frames(self):
        """All scalabel gt frames, eval order (for score_scalabel)."""
        return [self.videos[v][i] for v, i in self.index]

    def pull_item(self, index):
        video, i = self.index[index]
        frame = self.videos[video][i]
        img = _read_img(os.path.join(self.img_root, video, frame["name"]))
        res, _ = parse_labels(frame)
        info = (img.shape[0], img.shape[1], frame.get("frameIndex", i),
                self.video_names.index(video), f"{video}/{frame['name']}")
        return img, res[:, :5], info, np.array([index])

    def __getitem__(self, index):
        img, target, info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.img_size)
        return img, target, info, img_id
