"""Demo helpers (reference unicorn/utils/demo_utils.py): result formatting
and simple video IO wrappers used by tools/demo.py."""
from __future__ import annotations

import os

import cv2
import numpy as np


def mkdir(path):
    os.makedirs(path, exist_ok=True)
    return path


class VideoReader:
    def __init__(self, path):
        self.cap = cv2.VideoCapture(path)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or 30
        self.width = int(self.cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self.cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self.n_frames = int(self.cap.get(cv2.CAP_PROP_FRAME_COUNT))

    def __iter__(self):
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            yield frame
        self.cap.release()


class VideoWriter:
    def __init__(self, path, fps, size_wh):
        mkdir(os.path.dirname(path) or ".")
        self.writer = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, size_wh)

    def write(self, frame):
        self.writer.write(frame)

    def release(self):
        self.writer.release()


def dets_to_json(dets, class_names=None):
    """(N, 7) dets -> list of dicts for result dumping."""
    out = []
    for d in np.asarray(dets):
        cls_id = int(d[6])
        out.append({
            "bbox": [float(x) for x in d[:4]],
            "score": float(d[4] * d[5]),
            "category": class_names[cls_id] if class_names else cls_id,
        })
    return out
