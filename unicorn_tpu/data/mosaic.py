"""Mosaic + MixUp augmentation wrappers for detection pretraining.

Reference: unicorn/data/datasets/mosaicdetection.py:1-396 (MosaicDetection)
and mosaicdetection_uni.py (2-frame variant forbids mosaic, keeps joint flip).
4-image mosaic at a jittered center, random_perspective warp, optional
copy-paste MixUp, then the final TrainTransform.
"""
from __future__ import annotations

import random

import cv2
import numpy as np

from .transforms import random_perspective


def get_mosaic_coordinate(mosaic_index, xc, yc, w, h, input_h, input_w):
    """Paste rectangle for each of the 4 tiles (mosaicdetection.py:15-46)."""
    if mosaic_index == 0:  # top left
        x1, y1, x2, y2 = max(xc - w, 0), max(yc - h, 0), xc, yc
        s_x1, s_y1 = w - (x2 - x1), h - (y2 - y1)
        small = (s_x1, s_y1, w, h)
    elif mosaic_index == 1:  # top right
        x1, y1, x2, y2 = xc, max(yc - h, 0), min(xc + w, input_w * 2), yc
        small = (0, h - (y2 - y1), min(w, x2 - x1), h)
    elif mosaic_index == 2:  # bottom left
        x1, y1, x2, y2 = max(xc - w, 0), yc, xc, min(input_h * 2, yc + h)
        small = (w - (x2 - x1), 0, w, min(y2 - y1, h))
    else:  # bottom right
        x1, y1, x2, y2 = xc, yc, min(xc + w, input_w * 2), min(input_h * 2, yc + h)
        small = (0, 0, min(w, x2 - x1), min(y2 - y1, h))
    return (x1, y1, x2, y2), small


class MosaicDetection:
    """Wraps a detection dataset with mosaic + mixup (mosaicdetection.py)."""

    def __init__(self, dataset, img_size, preproc, mosaic_prob=1.0,
                 mixup_prob=1.0, degrees=10.0, translate=0.1,
                 mosaic_scale=(0.1, 2.0), mixup_scale=(0.5, 1.5),
                 shear=2.0, enable_mixup=True):
        self.dataset = dataset
        self.input_dim = tuple(img_size)
        self.preproc = preproc
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob
        self.degrees = degrees
        self.translate = translate
        self.scale = mosaic_scale
        self.mixup_scale = mixup_scale
        self.shear = shear
        self.enable_mixup = enable_mixup
        self.enable_mosaic = True

    def __len__(self):
        return len(self.dataset)

    def close_mosaic(self):
        """No-aug final epochs (reference DataLoader.close_mosaic)."""
        self.enable_mosaic = False
        self.enable_mixup = False

    def __getitem__(self, idx):
        if self.enable_mosaic and random.random() < self.mosaic_prob:
            input_h, input_w = self.input_dim
            yc = int(random.uniform(0.5 * input_h, 1.5 * input_h))
            xc = int(random.uniform(0.5 * input_w, 1.5 * input_w))
            indices = [idx] + [random.randint(0, len(self.dataset) - 1)
                               for _ in range(3)]
            mosaic_img = np.full((input_h * 2, input_w * 2, 3), 114, np.uint8)
            mosaic_labels = []
            for i, index in enumerate(indices):
                img, labels, _, _ = self.dataset.pull_item(index)
                h0, w0 = img.shape[:2]
                scale = min(1.0 * input_h / h0, 1.0 * input_w / w0)
                img = cv2.resize(img, (int(w0 * scale), int(h0 * scale)),
                                 interpolation=cv2.INTER_LINEAR)
                h, w = img.shape[:2]
                (x1, y1, x2, y2), (sx1, sy1, sx2, sy2) = get_mosaic_coordinate(
                    i, xc, yc, w, h, input_h, input_w)
                mosaic_img[y1:y2, x1:x2] = img[sy1:sy2, sx1:sx2]
                pad_w, pad_h = x1 - sx1, y1 - sy1
                if len(labels):
                    lab = labels.copy()
                    lab[:, [0, 2]] = labels[:, [0, 2]] * scale + pad_w
                    lab[:, [1, 3]] = labels[:, [1, 3]] * scale + pad_h
                    mosaic_labels.append(lab)
            if mosaic_labels:
                mosaic_labels = np.concatenate(mosaic_labels, 0)
                mosaic_labels[:, [0, 2]] = np.clip(
                    mosaic_labels[:, [0, 2]], 0, 2 * input_w)
                mosaic_labels[:, [1, 3]] = np.clip(
                    mosaic_labels[:, [1, 3]], 0, 2 * input_h)
            else:
                mosaic_labels = np.zeros((0, 5), np.float32)

            mosaic_img, mosaic_labels = random_perspective(
                mosaic_img, mosaic_labels, degrees=self.degrees,
                translate=self.translate, scale=self.scale, shear=self.shear,
                border=(-input_h // 2, -input_w // 2),
            )
            if (self.enable_mixup and len(mosaic_labels)
                    and random.random() < self.mixup_prob):
                mosaic_img, mosaic_labels = self.mixup(
                    mosaic_img, mosaic_labels, self.input_dim)
            img_t, labels_t = self.preproc(mosaic_img, mosaic_labels,
                                           self.input_dim)
            return img_t, labels_t, (input_h, input_w), np.array([idx])
        img, labels, info, img_id = self.dataset.pull_item(idx)
        img_t, labels_t = self.preproc(img, labels, self.input_dim)
        return img_t, labels_t, info, img_id

    def mixup(self, origin_img, origin_labels, input_dim):
        """Copy-paste mixup (mosaicdetection.py:250-331)."""
        jit_factor = random.uniform(*self.mixup_scale)
        flip = random.random() > 0.5
        cp_index = random.randint(0, len(self.dataset) - 1)
        img, cp_labels, _, _ = self.dataset.pull_item(cp_index)
        while len(cp_labels) == 0:
            cp_index = random.randint(0, len(self.dataset) - 1)
            img, cp_labels, _, _ = self.dataset.pull_item(cp_index)

        if len(img.shape) == 3:
            cp_img = np.full((input_dim[0], input_dim[1], 3), 114, np.uint8)
        else:
            cp_img = np.full(input_dim, 114, np.uint8)
        cp_scale_ratio = min(input_dim[0] / img.shape[0],
                             input_dim[1] / img.shape[1])
        resized = cv2.resize(
            img, (int(img.shape[1] * cp_scale_ratio),
                  int(img.shape[0] * cp_scale_ratio)),
            interpolation=cv2.INTER_LINEAR)
        cp_img[: resized.shape[0], : resized.shape[1]] = resized
        cp_img = cv2.resize(cp_img, (int(cp_img.shape[1] * jit_factor),
                                     int(cp_img.shape[0] * jit_factor)))
        cp_scale_ratio *= jit_factor
        if flip:
            cp_img = cp_img[:, ::-1, :]

        origin_h, origin_w = cp_img.shape[:2]
        target_h, target_w = origin_img.shape[:2]
        padded = np.zeros((max(origin_h, target_h),
                           max(origin_w, target_w), 3), np.uint8)
        padded[:origin_h, :origin_w] = cp_img
        x_offset = random.randint(0, max(padded.shape[1] - target_w, 0)) \
            if padded.shape[1] > target_w else 0
        y_offset = random.randint(0, max(padded.shape[0] - target_h, 0)) \
            if padded.shape[0] > target_h else 0
        cropped = padded[y_offset: y_offset + target_h,
                         x_offset: x_offset + target_w]

        boxes = cp_labels[:, :4].copy() * cp_scale_ratio
        if flip:
            boxes[:, 0::2] = origin_w - boxes[:, 2::-2]
        boxes[:, 0::2] = np.clip(boxes[:, 0::2] - x_offset, 0, target_w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2] - y_offset, 0, target_h)
        keep = ((boxes[:, 2] - boxes[:, 0]) > 1) & ((boxes[:, 3] - boxes[:, 1]) > 1)
        if keep.any():
            labels = np.hstack([boxes[keep], cp_labels[keep, 4:5]])
            origin_labels = np.vstack([origin_labels, labels])
            origin_img = origin_img.astype(np.float32)
            origin_img = 0.5 * origin_img + 0.5 * cropped.astype(np.float32)
        return origin_img.astype(np.uint8), origin_labels
