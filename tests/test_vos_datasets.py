"""VOS training dataset loaders over synthetic on-disk fixtures."""
import os

import cv2
import numpy as np
import pytest

from unicorn_tpu.data.datasets.vos import (
    DAVISTrainDataset,
    SaliencyDataset,
    YoutubeVOSDataset,
    _boxes_from_masks,
)


def test_boxes_from_masks():
    m = np.zeros((20, 30, 2), np.uint8)
    m[5:10, 8:14, 0] = 1
    m[0:3, 0:4, 1] = 1
    boxes = _boxes_from_masks(m)
    np.testing.assert_array_equal(boxes[0], [8, 5, 14, 10])
    np.testing.assert_array_equal(boxes[1], [0, 0, 4, 3])


def _write_seq(jdir, adir, n_frames=4, n_obj=2, size=(40, 60)):
    os.makedirs(jdir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)
    rng = np.random.RandomState(0)
    for t in range(n_frames):
        img = (rng.rand(*size, 3) * 255).astype(np.uint8)
        ann = np.zeros(size, np.uint8)
        for k in range(n_obj):
            y, x = 5 + 3 * t + 8 * k, 10 + 2 * t + 15 * k
            ann[y:y + 8, x:x + 10] = k + 1
        cv2.imwrite(os.path.join(jdir, f"{t:05d}.jpg"), img)
        cv2.imwrite(os.path.join(adir, f"{t:05d}.png"), ann)


def test_davis_train_dataset(tmp_path):
    root = str(tmp_path)
    _write_seq(os.path.join(root, "JPEGImages", "480p", "dog"),
               os.path.join(root, "Annotations", "480p", "dog"))
    os.makedirs(os.path.join(root, "ImageSets", "2017"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "2017", "train.txt"), "w") as f:
        f.write("dog\n")
    ds = DAVISTrainDataset(root)
    assert len(ds) == 1
    frames = ds.pull_item_omni(0, 2)
    assert len(frames) == 2
    img, res, masks = frames[0]
    assert img.shape == (40, 60, 3)
    assert res.shape == (2, 6)
    assert masks.shape == (40, 60, 2)
    assert set(res[:, 5]) == {1.0, 2.0}  # track ids = object ids


def test_youtube_vos_dataset(tmp_path):
    root = str(tmp_path)
    _write_seq(os.path.join(root, "train", "JPEGImages", "vid1"),
               os.path.join(root, "train", "Annotations", "vid1"))
    ds = YoutubeVOSDataset(root)
    assert len(ds) == 1
    frames = ds.pull_item_omni(0, 2)
    img, res, masks = frames[1]
    assert masks.shape[2] == res.shape[0] == 2


def test_saliency_dataset(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "image"))
    os.makedirs(os.path.join(root, "mask"))
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 48, 3) * 255).astype(np.uint8)
    mask = np.zeros((32, 48), np.uint8)
    mask[10:20, 15:35] = 255
    cv2.imwrite(os.path.join(root, "image", "a.jpg"), img)
    cv2.imwrite(os.path.join(root, "mask", "a.png"), mask)
    ds = SaliencyDataset(root)
    frames = ds.pull_item_omni(0, 2)
    assert len(frames) == 2
    _, res, m = frames[0]
    np.testing.assert_array_equal(res[0, :4], [15, 10, 35, 20])
    assert res[0, 5] == 1.0
