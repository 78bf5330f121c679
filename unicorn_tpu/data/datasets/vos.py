"""VOS / instance-mask training datasets.

Reference: unicorn/data/datasets/{youtube_vos.py:16-179, davis.py,
saliency.py:14-128, coco_inst.py, coco_mots.py}. All expose
`pull_item_omni(seq_id, num_frames)` returning frames of
(img HWC uint8, res (N, 6) [xyxy, cls, tid], masks (H, W, N)).
"""
from __future__ import annotations

import json
import os
import random

import cv2
import numpy as np

from ...utils.label_ops import read_indexed_mask
from .coco import COCOJson


def _read_img(path):
    img = cv2.imread(path)
    assert img is not None, f"file {path} not found"
    return img


def _boxes_from_masks(masks):
    """(H, W, N) -> (N, 4) xyxy tight boxes."""
    out = []
    for k in range(masks.shape[2]):
        ys, xs = np.nonzero(masks[:, :, k])
        if len(xs) == 0:
            out.append([0, 0, 0, 0])
        else:
            out.append([xs.min(), ys.min(), xs.max() + 1, ys.max() + 1])
    return np.asarray(out, np.float32)


class YoutubeVOSDataset:
    """YouTube-VOS 2018/2019 train (youtube_vos.py). Layout:
    root/train/JPEGImages/<seq>/*.jpg + Annotations/<seq>/*.png +
    meta.json."""

    def __init__(self, root, split="train", max_gap=30):
        self.root = os.path.join(root, split)
        self.max_gap = max_gap
        self._files_cache: dict = {}
        meta_path = os.path.join(self.root, "meta.json")
        self.sequences = []
        if os.path.exists(meta_path):
            meta = json.load(open(meta_path))["videos"]
            self.sequences = sorted(meta.keys())
        elif os.path.isdir(os.path.join(self.root, "JPEGImages")):
            self.sequences = sorted(os.listdir(os.path.join(self.root, "JPEGImages")))

    def __len__(self):
        return len(self.sequences)

    def pull_item_omni(self, seq_id, num_frames=2):
        name = self.sequences[seq_id]
        adir = os.path.join(self.root, "Annotations", name)
        jdir = os.path.join(self.root, "JPEGImages", name)
        ann_files = self._files_cache.get(seq_id)
        if ann_files is None:  # immutable dir listing: cache per sequence
            ann_files = sorted(os.listdir(adir))
            self._files_cache[seq_id] = ann_files
        a = random.randint(0, len(ann_files) - 1)
        b = random.randint(max(0, a - self.max_gap),
                           min(len(ann_files) - 1, a + self.max_gap))
        frames = []
        for idx in [a, b][:num_frames]:
            stem = os.path.splitext(ann_files[idx])[0]
            img = _read_img(os.path.join(jdir, stem + ".jpg"))
            ann = read_indexed_mask(os.path.join(adir, ann_files[idx]))
            obj_ids = sorted(int(i) for i in np.unique(ann) if i != 0)
            masks = np.stack([(ann == oid).astype(np.uint8)
                              for oid in obj_ids], axis=2) \
                if obj_ids else np.zeros(ann.shape + (0,), np.uint8)
            boxes = _boxes_from_masks(masks)
            res = np.concatenate([
                boxes, np.zeros((len(obj_ids), 1), np.float32),
                np.asarray(obj_ids, np.float32).reshape(-1, 1),
            ], axis=1) if obj_ids else np.zeros((0, 6), np.float32)
            frames.append((img, res, masks))
        return frames


class DAVISTrainDataset:
    """DAVIS 2017 train (davis.py). root/JPEGImages/480p + Annotations/480p
    + ImageSets/2017/train.txt."""

    def __init__(self, root, year="2017", split="train", max_gap=30):
        self.root = root
        self.max_gap = max_gap
        self._files_cache: dict = {}
        set_file = os.path.join(root, "ImageSets", year, f"{split}.txt")
        self.sequences = [l.strip() for l in open(set_file)] \
            if os.path.exists(set_file) else []

    def __len__(self):
        return len(self.sequences)

    def pull_item_omni(self, seq_id, num_frames=2):
        name = self.sequences[seq_id]
        jdir = os.path.join(self.root, "JPEGImages", "480p", name)
        adir = os.path.join(self.root, "Annotations", "480p", name)
        files = self._files_cache.get(seq_id)
        if files is None:  # immutable dir listing: cache per sequence
            files = sorted(os.listdir(adir))
            self._files_cache[seq_id] = files
        a = random.randint(0, len(files) - 1)
        b = random.randint(max(0, a - self.max_gap),
                           min(len(files) - 1, a + self.max_gap))
        frames = []
        for idx in [a, b][:num_frames]:
            stem = os.path.splitext(files[idx])[0]
            img = _read_img(os.path.join(jdir, stem + ".jpg"))
            ann = read_indexed_mask(os.path.join(adir, files[idx]))
            obj_ids = sorted(int(i) for i in np.unique(ann) if i != 0)
            masks = np.stack([(ann == oid).astype(np.uint8)
                              for oid in obj_ids], axis=2) \
                if obj_ids else np.zeros(ann.shape + (0,), np.uint8)
            boxes = _boxes_from_masks(masks)
            res = np.concatenate([
                boxes, np.zeros((len(obj_ids), 1), np.float32),
                np.asarray(obj_ids, np.float32).reshape(-1, 1),
            ], axis=1) if obj_ids else np.zeros((0, 6), np.float32)
            frames.append((img, res, masks))
        return frames


class SaliencyDataset:
    """Saliency datasets (DUTS etc.): single image + binary mask, box from
    mask, duplicated as a 2-frame video (saliency.py:14-128). Layout:
    root/image/*.jpg + mask/*.png."""

    def __init__(self, root):
        self.root = root
        img_dir = os.path.join(root, "image")
        self.items = sorted(os.listdir(img_dir)) if os.path.isdir(img_dir) else []

    def __len__(self):
        return len(self.items)

    def pull_item_omni(self, seq_id, num_frames=2):
        stem = os.path.splitext(self.items[seq_id])[0]
        img = _read_img(os.path.join(self.root, "image", self.items[seq_id]))
        mask_path = os.path.join(self.root, "mask", stem + ".png")
        mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
        assert mask is not None, f"file {mask_path} not found"
        m = (mask > 127).astype(np.uint8)[:, :, None]
        boxes = _boxes_from_masks(m)
        res = np.concatenate([boxes, np.zeros((1, 1), np.float32),
                              np.ones((1, 1), np.float32)], axis=1)
        return [(img.copy(), res.copy(), m.copy()) for _ in range(num_frames)]


class COCOMOTSDataset:
    """COCO instances as static 2-frame MOTS samples (coco_mots.py):
    polygons/RLE decoded to masks, per-instance track ids."""

    def __init__(self, data_dir, json_file="instances_train2017.json",
                 name="train2017", person_only=False):
        self.data_dir = data_dir
        self.coco = COCOJson(os.path.join(data_dir, "annotations", json_file))
        self.name = name
        self.class_ids = self.coco.get_cat_ids()
        self.person_only = person_only
        self.ids = [i for i in self.coco.get_img_ids()
                    if self.coco.load_anns_for_img(i)]

    def __len__(self):
        return len(self.ids)

    def _decode_seg(self, a, h, w):
        seg = a.get("segmentation")
        if seg is None:
            return None
        if isinstance(seg, dict):
            from ...evaluators import rle as rle_codec

            return rle_codec.decode(seg)
        mask = np.zeros((h, w), np.uint8)
        for poly in seg:
            pts = np.asarray(poly, np.float64).reshape(-1, 2)
            cv2.fillPoly(mask, [pts.astype(np.int32)], 1)
        return mask

    def pull_item_omni(self, seq_id, num_frames=2):
        img_id = self.ids[seq_id]
        im = self.coco.imgs[img_id]
        img = _read_img(os.path.join(self.data_dir, self.name, im["file_name"]))
        h, w = im["height"], im["width"]
        objs, masks = [], []
        tid = 1
        for a in self.coco.load_anns_for_img(img_id):
            if a.get("iscrowd", 0):
                continue
            cls = self.class_ids.index(a["category_id"])
            if self.person_only and cls != 0:
                continue
            m = self._decode_seg(a, h, w)
            if m is None or m.sum() == 0:
                continue
            x, y, bw, bh = a["bbox"]
            objs.append([x, y, x + bw, y + bh, cls, tid])
            masks.append(m)
            tid += 1
        if not objs:
            res = np.zeros((0, 6), np.float32)
            mk = np.zeros((h, w, 0), np.uint8)
        else:
            res = np.asarray(objs, np.float32)
            mk = np.stack(masks, axis=2)
        return [(img.copy(), res.copy(), mk.copy()) for _ in range(num_frames)]


class MOTSVideoDataset:
    """MOTS-Challenge video MOTS training (reference mots_mot.py:69-181,
    MOTSMOTDataset): 2-frame temporal samples with per-instance RLE masks
    and persistent track ids. Consumes the COCO-video json written by
    ``tools/convert_datasets.py mots`` (RLE segmentations + video_id/
    frame_id/track_id), instead of re-parsing gt.txt per item."""

    def __init__(self, data_dir, json_file="train_mots.json", max_gap=30):
        self.data_dir = data_dir
        self.coco = COCOJson(os.path.join(data_dir, "annotations", json_file))
        self.max_gap = max_gap
        self.ids = self.coco.get_img_ids()
        # group frames by video for temporal sampling; keep only frames
        # with at least one annotation (empty MOTS frames teach nothing)
        from collections import defaultdict

        self.video_frames = defaultdict(list)
        for img_id in self.ids:
            im = self.coco.imgs[img_id]
            if self.coco.load_anns_for_img(img_id):
                self.video_frames[im.get("video_id", -1)].append(
                    (im.get("frame_id", 0), img_id))
        for v in self.video_frames.values():
            v.sort()
        self.ids = [i for v in self.video_frames.values() for _, i in v]

    def __len__(self):
        return len(self.ids)

    def _load(self, img_id):
        from ...evaluators import rle as rle_codec

        im = self.coco.imgs[img_id]
        img = _read_img(os.path.join(self.data_dir, im["file_name"]))
        h, w = im["height"], im["width"]
        objs, masks = [], []
        for a in self.coco.load_anns_for_img(img_id):
            if a.get("iscrowd", 0):
                continue
            m = a.get("segmentation")
            m = rle_codec.decode(m) if isinstance(m, dict) else None
            if m is None or m.sum() == 0:
                continue
            x, y, bw, bh = a["bbox"]
            objs.append([x, y, x + bw, y + bh, 0, a.get("track_id", -1)])
            masks.append(m)
        if not objs:
            return img, np.zeros((0, 6), np.float32), np.zeros((h, w, 0),
                                                               np.uint8)
        return img, np.asarray(objs, np.float32), np.stack(masks, axis=2)

    def pull_item_omni(self, seq_id, num_frames=2):
        img_id = self.ids[seq_id]
        im = self.coco.imgs[img_id]
        frames_avail = self.video_frames[im.get("video_id", -1)]
        fid = im.get("frame_id", 0)
        # max_gap is in FRAME-ID units (reference mots_mot.py max_interval
        # semantics), not annotated-frame-list indices — sparsely annotated
        # videos must not stretch the temporal window
        cands = [i for f, i in frames_avail if abs(f - fid) <= self.max_gap]
        out = [self._load(img_id)]
        for _ in range(num_frames - 1):
            out.append(self._load(random.choice(cands)))
        return out
