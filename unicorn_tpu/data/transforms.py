"""Augmentations + train/val transforms, host-side numpy/cv2.

Reference: unicorn/data/data_augment.py (augment_hsv:21, _mirror, random_
perspective:58-169, TrainTransform:349-436, TrainTransform_omni:601-690,
TrainTransform_Ins:691-791, ValTransform:437-469). Images stay HWC (NHWC
models); labels are [cls, cx, cy, w, h(, tid)] padded to max_labels.
"""
from __future__ import annotations

import math
import random

import cv2
import numpy as np

from .preproc import letterbox, letterbox_mask


def xyxy2cxcywh(boxes):
    out = boxes.copy()
    out[:, 0] = (boxes[:, 0] + boxes[:, 2]) / 2
    out[:, 1] = (boxes[:, 1] + boxes[:, 3]) / 2
    out[:, 2] = boxes[:, 2] - boxes[:, 0]
    out[:, 3] = boxes[:, 3] - boxes[:, 1]
    return out


def augment_hsv(img, hgain=0.015, sgain=0.7, vgain=0.4):
    """In-place HSV jitter (data_augment.py:21-35)."""
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_BGR2HSV))
    dtype = img.dtype
    x = np.arange(0, 256, dtype=np.int16)
    lut_hue = ((x * r[0]) % 180).astype(dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(dtype)
    img_hsv = cv2.merge(
        (cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val))
    ).astype(dtype)
    cv2.cvtColor(img_hsv, cv2.COLOR_HSV2BGR, dst=img)


def mirror(image, boxes, prob=0.5):
    """Random horizontal flip; boxes xyxy (data_augment.py `_mirror`)."""
    _, width, _ = image.shape
    if random.random() < prob:
        image = image[:, ::-1]
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


def mirror_joint(image, boxes):
    """Deterministic flip for joint 2-frame flipping (`_mirror_joint`)."""
    _, width, _ = image.shape
    image = image[:, ::-1]
    boxes = boxes.copy()
    boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.2):
    """(data_augment.py:38-52) box1/box2: (4, N) xyxy before/after."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + 1e-16) > area_thr) & (ar < ar_thr)


def random_perspective(
    img, targets=(), degrees=10, translate=0.1, scale=(0.5, 1.5), shear=2.0,
    perspective=0.0, border=(0, 0), masks=None,
):
    """Random affine/perspective warp (data_augment.py:58-169).

    targets: (N, >=5) [cls?, xyxy...] — here expects targets[:, :4]=xyxy with
    extra cols preserved. Returns (img, targets[, masks]).
    """
    height = img.shape[0] + border[0] * 2
    width = img.shape[1] + border[1] * 2

    C = np.eye(3)
    C[0, 2] = -img.shape[1] / 2
    C[1, 2] = -img.shape[0] / 2
    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(scale[0], scale[1])
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)
    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * height
    M = T @ S @ R @ C

    if (border[0] != 0) or (border[1] != 0) or (M != np.eye(3)).any():
        if perspective:
            img = cv2.warpPerspective(img, M, dsize=(width, height),
                                      borderValue=(114, 114, 114))
        else:
            img = cv2.warpAffine(img, M[:2], dsize=(width, height),
                                 borderValue=(114, 114, 114))
        if masks is not None:
            masks = cv2.warpAffine(masks, M[:2], dsize=(width, height),
                                   borderValue=0)
            if masks.ndim == 2:
                masks = masks[:, :, None]

    n = len(targets)
    if n:
        xy = np.ones((n * 4, 3))
        xy[:, :2] = targets[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(n * 4, 2)
        xy = xy @ M.T
        xy = (xy[:, :2] / xy[:, 2:3] if perspective else xy[:, :2]).reshape(n, 8)
        x = xy[:, [0, 2, 4, 6]]
        y = xy[:, [1, 3, 5, 7]]
        new_boxes = np.concatenate(
            (x.min(1), y.min(1), x.max(1), y.max(1))
        ).reshape(4, n).T
        new_boxes[:, [0, 2]] = new_boxes[:, [0, 2]].clip(0, width)
        new_boxes[:, [1, 3]] = new_boxes[:, [1, 3]].clip(0, height)
        keep = box_candidates(box1=targets[:, :4].T * s, box2=new_boxes.T)
        targets = targets[keep]
        targets[:, :4] = new_boxes[keep]
        if masks is not None:
            masks = masks[:, :, keep] if masks.shape[2] == n else masks
    if masks is not None:
        return img, targets, masks
    return img, targets


class TrainTransform:
    """Single-frame det/MOT transform (data_augment.py:349-436).

    Input: image HWC uint8, targets (N, 5|6) [xyxy, cls(, tid)].
    Output: image HWC float32 letterboxed, labels (max_labels, 5|6)
    [cls, cx, cy, w, h(, tid)].
    """

    def __init__(self, max_labels=50, flip_prob=0.5, hsv_prob=1.0):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob

    def __call__(self, image, targets, input_dim):
        ncol = targets.shape[1] if len(targets) else 5
        has_tid = ncol == 6
        if len(targets) == 0:
            image, _ = letterbox(image, input_dim)
            return image, np.zeros((self.max_labels, ncol), np.float32)

        image_o, targets_o = image.copy(), targets.copy()
        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        tids = targets[:, 5].copy() if has_tid else None

        if random.random() < self.hsv_prob:
            augment_hsv(image)
        image_t, boxes = mirror(image, boxes, self.flip_prob)
        image_t, r_ = letterbox(image_t, input_dim)
        boxes = xyxy2cxcywh(boxes) * r_

        keep = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t, labels_t = boxes[keep], labels[keep]
        tids_t = tids[keep] if has_tid else None

        if len(boxes_t) == 0:
            image_t, r_o = letterbox(image_o, input_dim)
            boxes_t = xyxy2cxcywh(targets_o[:, :4].copy()) * r_o
            labels_t = targets_o[:, 4]
            tids_t = targets_o[:, 5] if has_tid else None

        cols = [labels_t[:, None], boxes_t]
        if has_tid:
            cols.append(tids_t[:, None])
        targets_t = np.hstack(cols)
        padded = np.zeros((self.max_labels, ncol), np.float32)
        padded[: min(len(targets_t), self.max_labels)] = targets_t[: self.max_labels]
        return image_t, padded


class TrainTransformOmni:
    """2-frame SOT/MOT transform (data_augment.py:601-690). One call per
    frame; `joint`/`flip` flags keep the flip consistent across frames.
    Always outputs 6-col labels (SOT gets tid=1 on its single target).
    """

    def __init__(self, max_labels=100, flip_prob=0.5, hsv_prob=1.0):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob

    def __call__(self, image, targets, input_dim, joint=False, flip=False):
        has_tid = len(targets) > 0 and targets.shape[1] == 6
        if len(targets) == 0:
            image, _ = letterbox(image, input_dim)
            return image, np.zeros((self.max_labels, 6), np.float32)

        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        if has_tid:
            tids = targets[:, 5].copy()
        else:
            tids = np.zeros((len(targets),))
            tids[0] = 1

        image_o = image.copy()
        targets_o = targets.copy()

        if random.random() < self.hsv_prob:
            augment_hsv(image)
        if joint:
            image_t, boxes = mirror_joint(image, boxes) if flip else (image, boxes)
        else:
            image_t, boxes = mirror(image, boxes, self.flip_prob)
        image_t, r_ = letterbox(image_t, input_dim)
        boxes = xyxy2cxcywh(boxes) * r_

        keep = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t, labels_t, tids_t = boxes[keep], labels[keep], tids[keep]

        if len(boxes_t) == 0:
            image_t, r_o = letterbox(image_o, input_dim)
            boxes_t = xyxy2cxcywh(targets_o[:, :4].copy()) * r_o
            labels_t = targets_o[:, 4]
            if has_tid:
                tids_t = targets_o[:, 5]
            else:
                tids_t = np.zeros((len(targets_o),))
                tids_t[0] = 1

        targets_t = np.hstack([labels_t[:, None], boxes_t, tids_t[:, None]])
        padded = np.zeros((self.max_labels, 6), np.float32)
        padded[: min(len(targets_t), self.max_labels)] = targets_t[: self.max_labels]
        return image_t, padded


class TrainTransform4Tasks:
    """Joint 4-task transform (data_augment.py:792-806): dispatch by whether
    the sample carries masks — box tasks (SOT/MOT) go through
    TrainTransformOmni, mask tasks (VOS/MOTS) through TrainTransformIns.
    Returns (image, labels (max_labels, 6), masks|None)."""

    def __init__(self, max_labels=100, flip_prob=0.5, hsv_prob=1.0,
                 d_rate=4):
        # d_rate is the integer mask-downsampling divisor (reference's
        # d_rate=1/4 fraction == our //4)
        self.trans_omni = TrainTransformOmni(max_labels, flip_prob, hsv_prob)
        self.trans_inst = TrainTransformIns(max_labels, flip_prob, hsv_prob,
                                            d_rate=d_rate)

    def __call__(self, image, targets, masks, input_dim, joint=False,
                 flip=False):
        if masks is None:
            img_t, labels = self.trans_omni(image, targets, input_dim,
                                            joint=joint, flip=flip)
            return img_t, labels, None
        return self.trans_inst(image, targets, masks, input_dim,
                               joint=joint, flip=flip)


class TrainTransformIns:
    """Instance-seg transform: TrainTransformOmni + masks downsampled by
    d_rate (data_augment.py:691-791)."""

    def __init__(self, max_labels=100, flip_prob=0.5, hsv_prob=1.0, d_rate=4):
        self.max_labels = max_labels
        self.flip_prob = flip_prob
        self.hsv_prob = hsv_prob
        self.d_rate = d_rate

    def __call__(self, image, targets, masks, input_dim, joint=False, flip=False):
        """masks: (H, W, N) aligned with targets rows."""
        has_tid = len(targets) > 0 and targets.shape[1] == 6
        out_h, out_w = input_dim[0] // self.d_rate, input_dim[1] // self.d_rate
        if len(targets) == 0:
            image, _ = letterbox(image, input_dim)
            return (image, np.zeros((self.max_labels, 6), np.float32),
                    np.zeros((self.max_labels, out_h, out_w), np.float32))

        boxes = targets[:, :4].copy()
        labels = targets[:, 4].copy()
        if has_tid:
            tids = targets[:, 5].copy()
        else:
            tids = np.zeros((len(targets),))
            tids[0] = 1

        image_o = image.copy()
        targets_o = targets.copy()

        if random.random() < self.hsv_prob:
            augment_hsv(image)
        do_flip = flip if joint else (random.random() < self.flip_prob)
        if do_flip:
            image, boxes = mirror_joint(image, boxes)
            masks = masks[:, ::-1]

        image_t, r_ = letterbox(image, input_dim)
        masks_t, _ = letterbox_mask(masks, input_dim)
        boxes = xyxy2cxcywh(boxes) * r_

        keep = np.minimum(boxes[:, 2], boxes[:, 3]) > 1
        boxes_t, labels_t, tids_t = boxes[keep], labels[keep], tids[keep]
        masks_t = masks_t[:, :, keep]

        if len(boxes_t) == 0:
            # All boxes filtered by the >1px size gate: restore the
            # UN-augmented boxes/labels/tids and zero the masks, exactly as
            # the reference does (data_augment.py:761-768) and as the box
            # transforms above already do — otherwise the sample silently
            # becomes all-zero labels and the 2-frame association loss sees
            # a target present in one frame with no label row in the other.
            image_t, r_o = letterbox(image_o, input_dim)
            boxes_t = xyxy2cxcywh(targets_o[:, :4].copy()) * r_o
            labels_t = targets_o[:, 4]
            if has_tid:
                tids_t = targets_o[:, 5]
            else:
                tids_t = np.zeros((len(targets_o),))
                tids_t[0] = 1
            masks_t = np.zeros(
                (image_t.shape[0], image_t.shape[1], len(boxes_t)), np.float32)

        targets_t = np.hstack([labels_t[:, None], boxes_t, tids_t[:, None]])
        padded = np.zeros((self.max_labels, 6), np.float32)
        n = min(len(targets_t), self.max_labels)
        padded[:n] = targets_t[:n]

        padded_masks = np.zeros((self.max_labels, out_h, out_w), np.float32)
        if n:
            small = cv2.resize(
                masks_t[:, :, :n], (out_w, out_h), interpolation=cv2.INTER_LINEAR
            )
            if small.ndim == 2:
                small = small[:, :, None]
            padded_masks[:n] = np.transpose(small, (2, 0, 1))
        return image_t, padded, padded_masks


class ValTransform:
    """Eval-time letterbox (data_augment.py:437-469)."""

    def __call__(self, img, res, input_size):
        img, _ = letterbox(img, input_size)
        return img, np.zeros((1, 5), np.float32)
