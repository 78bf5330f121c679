"""MOT datasets: 2-frame omni training sampling from COCO-format video
annotations (MOT17/CrowdHuman/CityPersons/ETHZ/BDD100K) and the per-video
eval dataset.

Reference: unicorn/data/datasets/{mot_omni.py:13-196, bdd_omni.py:15-141,
mot.py:11}. Video COCO-jsons carry `video_id` + `frame_id` per image and
`track_id` per annotation (produced by tools/convert_*_to_coco.py).
"""
from __future__ import annotations

import bisect
import os
import random
from collections import defaultdict

import cv2
import numpy as np

from .coco import COCOJson


def _read_img(path):
    img = cv2.imread(path)
    assert img is not None, f"file {path} not found"
    return img


class MOTOmniDataset:
    """2-frame MOT training sampling (mot_omni.py). Static-image datasets
    (CrowdHuman etc.) duplicate the frame; video datasets sample a nearby
    second frame from the same video."""

    def __init__(self, data_dir, json_file, name="train", max_gap=30,
                 img_root=None):
        self.data_dir = data_dir
        self.coco = COCOJson(os.path.join(data_dir, "annotations", json_file))
        self.name = name
        self.img_root = img_root or os.path.join(data_dir, name)
        self.max_gap = max_gap
        self.ids = self.coco.get_img_ids()
        self.class_ids = self.coco.get_cat_ids()
        # group images by video for temporal sampling
        self.video_frames = defaultdict(list)  # video_id -> [(frame_id, img_id)]
        for img_id in self.ids:
            im = self.coco.imgs[img_id]
            vid = im.get("video_id", -1)
            fid = im.get("frame_id", 0)
            self.video_frames[vid].append((fid, img_id))
        for v in self.video_frames.values():
            v.sort()

    def __len__(self):
        return len(self.ids)

    def _load(self, img_id):
        im = self.coco.imgs[img_id]
        file_name = im["file_name"]
        img = _read_img(os.path.join(self.img_root, file_name))
        objs = []
        for a in self.coco.load_anns_for_img(img_id):
            if a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]
            tid = a.get("track_id", -1)
            cls = self.class_ids.index(a["category_id"])
            objs.append([x, y, x + w, y + h, cls, tid])
        return img, np.asarray(objs, np.float32).reshape(-1, 6)

    def pull_item_omni(self, seq_id, num_frames=2):
        img_id = self.ids[seq_id]
        im = self.coco.imgs[img_id]
        vid = im.get("video_id", -1)
        frames_avail = self.video_frames[vid]
        if len(frames_avail) <= 1 or vid == -1:
            img, res = self._load(img_id)
            if res[:, 5].max(initial=-1) < 0:
                # static image: synthesize unique track ids
                res[:, 5] = np.arange(1, len(res) + 1)
            return [(img.copy(), res.copy()) for _ in range(num_frames)]
        fid = im.get("frame_id", 0)
        fids = [f for f, _ in frames_avail]
        pos = fids.index(fid)
        # max_gap is in FRAME-ID units (same contract as MOTSVideoDataset):
        # on sparsely-annotated videos, list-position distance would widen
        # the temporal window by the annotation stride.
        lo = bisect.bisect_left(fids, fid - self.max_gap)
        hi = bisect.bisect_right(fids, fid + self.max_gap) - 1
        pos2 = random.randint(lo, hi)
        out = []
        for p in [pos, pos2][:num_frames]:
            img, res = self._load(frames_avail[p][1])
            out.append((img, res))
        return out


class MOTEvalDataset:
    """Frame-ordered eval dataset over a COCO-format video json (mot.py:11).
    __getitem__ yields (img, target, img_info, img_id) with img_info =
    (height, width, frame_id, video_id, file_name)."""

    def __init__(self, data_dir, json_file="test.json", name="test",
                 img_size=(800, 1280), preproc=None):
        self.data_dir = data_dir
        self.coco = COCOJson(os.path.join(data_dir, "annotations", json_file))
        self.name = name
        self.img_size = img_size
        self.preproc = preproc
        self.ids = self.coco.get_img_ids()
        self.class_ids = self.coco.get_cat_ids()

    def __len__(self):
        return len(self.ids)

    def pull_item(self, index):
        img_id = self.ids[index]
        im = self.coco.imgs[img_id]
        img = _read_img(os.path.join(self.data_dir, self.name, im["file_name"]))
        objs = []
        for a in self.coco.load_anns_for_img(img_id):
            x, y, w, h = a["bbox"]
            objs.append([x, y, x + w, y + h,
                         self.class_ids.index(a["category_id"])])
        res = np.asarray(objs, np.float32).reshape(-1, 5)
        info = (im["height"], im["width"], im.get("frame_id", 0),
                im.get("video_id", -1), im["file_name"])
        return img, res, info, np.array([img_id])

    def __getitem__(self, index):
        img, target, info, img_id = self.pull_item(index)
        if self.preproc is not None:
            img, target = self.preproc(img, target, self.img_size)
        return img, target, info, img_id
