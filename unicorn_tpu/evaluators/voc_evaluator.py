"""VOC detection evaluator: drives a detector over VOCDetection and scores
with the VOC protocol (voc_eval.py).

Reference: unicorn/evaluators/voc_evaluator.py:1-187 (inference loop +
per-class AP via voc_eval). Pairs with data/datasets/voc.VOCDetection.
"""
from __future__ import annotations

from collections import defaultdict

import numpy as np

from ..data.preproc import letterbox
from .voc_eval import voc_map


class VOCEvaluator:
    def __init__(self, dataset, img_size=(640, 640), conf_thre=0.01,
                 nms_thre=0.65, use_07_metric=False, iou_thr=0.5):
        self.dataset = dataset
        self.img_size = tuple(img_size)
        self.conf_thre = conf_thre
        self.nms_thre = nms_thre
        self.use_07_metric = use_07_metric
        self.iou_thr = iou_thr

    def evaluate(self, detect_fn, max_images=None):
        """detect_fn(img (1,H,W,3) float32) -> (K, 7) np array
        [x1,y1,x2,y2,obj,cls_conf,cls] in letterboxed coords (or empty).

        Returns {"mAP": float, "per_class": {cls_idx: ap}}.
        """
        import jax.numpy as jnp

        n = len(self.dataset) if max_images is None else min(
            max_images, len(self.dataset))
        all_dets = defaultdict(list)   # cls -> [(img_id, score, box...)]
        all_gts = defaultdict(dict)    # cls -> {img_id: (boxes, difficult)}
        for i in range(n):
            img, gt, (h, w), _ = self.dataset.pull_item(i)
            # register gt per class (difficult handling: dataset may keep
            # them; VOCDetection stores no flag post-parse, treat all scored)
            for c in np.unique(gt[:, 4]).astype(int) if len(gt) else []:
                boxes = gt[gt[:, 4] == c, :4]
                all_gts[c][i] = (boxes, np.zeros(len(boxes), bool))
            lb, r = letterbox(img, self.img_size)
            dets = detect_fn(jnp.asarray(lb[None].astype(np.float32)))
            dets = np.asarray(dets).reshape(-1, 7)
            for d in dets:
                score = float(d[4] * d[5])
                if score < self.conf_thre:
                    continue
                box = d[:4] / r
                all_dets[int(d[6])].append(
                    (i, score, box[0], box[1], box[2], box[3]))
        # VOC protocol: average over classes WITH ground truth — a class
        # with gt but no dets counts (AP 0), a spurious detection of a
        # class with no gt in the evaluated subset must not deflate mAP
        classes = sorted(all_gts)
        dets_by_cls = {c: all_dets.get(c, []) for c in classes}
        gts_by_cls = {c: all_gts.get(c, {}) for c in classes}
        return voc_map(dets_by_cls, gts_by_cls, iou_thr=self.iou_thr,
                       use_07_metric=self.use_07_metric)
