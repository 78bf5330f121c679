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


def test_mots_video_dataset(tmp_path):
    """MOTSVideoDataset (reference mots_mot.py MOTSMOTDataset role): 2-frame
    temporal samples over the converted MOTS COCO-video json with RLE masks
    and persistent track ids."""
    import json

    from unicorn_tpu.data.datasets.vos import MOTSVideoDataset
    from unicorn_tpu.evaluators import rle as rle_codec

    root = str(tmp_path)
    h, w = 48, 48
    rng = np.random.RandomState(0)
    images, anns = [], []
    img_id = ann_id = 1
    for f in range(1, 4):
        fname = f"seq01/img1/{f:06d}.jpg"
        os.makedirs(os.path.join(root, "seq01", "img1"), exist_ok=True)
        cv2.imwrite(os.path.join(root, fname),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "video_id": 1, "frame_id": f,
                       "file_name": fname, "height": h, "width": w})
        for oid in (1, 2):
            m = np.zeros((h, w), np.uint8)
            y, x = 4 + 2 * f + 10 * oid, 6 + f + 12 * oid
            m[y:y + 6, x:x + 8] = 1
            anns.append({"id": ann_id, "image_id": img_id, "category_id": 1,
                         "track_id": oid, "iscrowd": 0,
                         "bbox": [float(x), float(y), 8.0, 6.0],
                         "area": 48.0,
                         "segmentation": rle_codec.encode(m)})
            ann_id += 1
        img_id += 1
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "pedestrian"}]},
              open(os.path.join(root, "annotations", "train_mots.json"), "w"))

    ds = MOTSVideoDataset(root)
    assert len(ds) == 3
    frames = ds.pull_item_omni(0, 2)
    assert len(frames) == 2
    for img, res, masks in frames:
        assert img.shape == (h, w, 3)
        assert res.shape == (2, 6)
        assert masks.shape == (h, w, 2)
        assert set(res[:, 5]) == {1.0, 2.0}  # persistent track ids
        # boxes tight on the decoded masks
        np.testing.assert_array_equal(
            _boxes_from_masks(masks), res[:, :4] + [0, 0, 0, 0])


def test_track_mask_exp_mix_specs(tmp_path, monkeypatch):
    """Mask-stage mix matches unicorn_track_mask.py:187-229: VOS group
    [COCO-inst, Saliency, DAVIS, YouTubeVOS] all weight 1; MOTS group is
    BDD (bdd100k) or COCO-person + MOTS-Challenge (motchallenge)."""
    from unicorn_tpu.exp.track_mask import ExpTrackMask

    monkeypatch.setenv("UNICORN_DATADIR", str(tmp_path))
    exp = ExpTrackMask()
    assert [(n, w) for n, w, _ in exp._vos_dataset_specs(str(tmp_path))] == \
        [("COCO-inst", 1), ("Saliency", 1), ("DAVIS", 1), ("YouTubeVOS", 1)]
    assert [(n, w) for n, w, _ in exp._mots_dataset_specs(str(tmp_path))] == \
        [("BDD-MOTS", 1)]
    exp.mot_test_name = "motchallenge"
    assert [(n, w) for n, w, _ in exp._mots_dataset_specs(str(tmp_path))] == \
        [("COCO-person", 1), ("MOTS-Challenge", 1)]
    # nothing on disk -> both groups empty, no crash
    ds = exp.get_dataset()
    assert ds.sot_dataset is None and ds.mot_dataset is None


def test_mots_video_dataset_through_mask_loader(tmp_path):
    """MOTSVideoDataset feeds UniMaskLoader: real mask-stage batches
    (images/targets/task_ids/masks) come out static-shaped."""
    import json

    from unicorn_tpu.data.datasets.omni import OmniDataset, OmniDatasetPlus
    from unicorn_tpu.data.datasets.vos import MOTSVideoDataset
    from unicorn_tpu.data.loader import UniMaskLoader
    from unicorn_tpu.data.transforms import TrainTransformIns
    from unicorn_tpu.evaluators import rle as rle_codec

    root = str(tmp_path)
    h, w = 48, 48
    rng = np.random.RandomState(5)
    images, anns = [], []
    img_id = ann_id = 1
    for f in range(1, 5):
        fname = f"seq01/img1/{f:06d}.jpg"
        os.makedirs(os.path.join(root, "seq01", "img1"), exist_ok=True)
        cv2.imwrite(os.path.join(root, fname),
                    (rng.rand(h, w, 3) * 255).astype(np.uint8))
        images.append({"id": img_id, "video_id": 1, "frame_id": f,
                       "file_name": fname, "height": h, "width": w})
        m = np.zeros((h, w), np.uint8)
        m[6 + f:20 + f, 8:24] = 1
        anns.append({"id": ann_id, "image_id": img_id, "category_id": 1,
                     "track_id": 1, "iscrowd": 0,
                     "bbox": [8.0, 6.0 + f, 16.0, 14.0], "area": 224.0,
                     "segmentation": rle_codec.encode(m)})
        img_id += 1
        ann_id += 1
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    json.dump({"images": images, "annotations": anns,
               "categories": [{"id": 1, "name": "pedestrian"}]},
              open(os.path.join(root, "annotations", "train_mots.json"), "w"))

    ds = MOTSVideoDataset(root)
    mots = OmniDataset([ds], samples_per_epoch=4)
    omni = OmniDatasetPlus(None, mots, 4, mode="alter")
    loader = UniMaskLoader(
        omni, TrainTransformIns(max_labels=3, flip_prob=0.0, hsv_prob=0.0,
                                d_rate=2),
        batch_size=2, input_size=(32, 32))
    imgs, targets, task_ids, masks = next(iter(loader))
    assert imgs.shape == (2, 2, 32, 32, 3)
    assert targets.shape == (2, 2, 3, 6)
    assert set(np.asarray(task_ids)) == {2}   # MOTS task
    assert masks.shape[:3] == (2, 2, 3)
    assert masks.max() > 0  # the rle-decoded mask survived the transform
    if hasattr(loader, "close"):
        loader.close()
