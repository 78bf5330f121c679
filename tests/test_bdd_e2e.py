"""BDD100K end-to-end: native scalabel loaders, 2-frame omni sampling, MOTS
rle decoding, and evaluator scoring (mMOTA=1.0 on perfect mock tracking).

Covers VERDICT r1 item 3: the BDD path from annotation ingestion
(data/datasets/bdd.py, reference bdd_omni.py:15-141 / bdd_omni_mots.py) to
scalabel-protocol scoring (evaluators/bdd_evaluator.score_scalabel).
"""
import json
import os

import cv2
import numpy as np
import pytest

from unicorn_tpu.data.datasets.bdd import (
    BDD_CLASSES, BDDEvalDataset, BDDOmniDataset, BDDOmniMOTSDataset,
    load_scalabel, parse_labels,
)
from unicorn_tpu.evaluators import rle as rle_codec
from unicorn_tpu.evaluators.bdd_evaluator import BDDEvaluator, score_scalabel

H, W = 64, 96
N_FRAMES = 6


def _boxes_at(t):
    """Three moving objects: car, pedestrian, car."""
    return [
        ("car", 1, [4 + 2 * t, 6, 24 + 2 * t, 22]),
        ("pedestrian", 2, [40, 8 + 2 * t, 52, 30 + 2 * t]),
        ("car", 3, [60 - t, 36, 84 - t, 54]),
    ]


def _make_fixture(root, with_mots=False):
    for vi, video in enumerate(("vid_a", "vid_b")):
        img_dir = os.path.join(root, "images", "track", "val", video)
        os.makedirs(img_dir, exist_ok=True)
        frames = []
        for t in range(N_FRAMES):
            name = f"{video}-{t:07d}.jpg"
            img = np.full((H, W, 3), 60 + 10 * vi, np.uint8)
            labels = []
            for cat, oid, (x1, y1, x2, y2) in _boxes_at(t):
                img[y1:y2, x1:x2] = (200, 50 * oid, 100)
                lab = {"id": oid + 10 * vi, "category": cat,
                       "box2d": {"x1": float(x1), "y1": float(y1),
                                 "x2": float(x2), "y2": float(y2)}}
                if with_mots:
                    m = np.zeros((H, W), np.uint8)
                    m[y1:y2, x1:x2] = 1
                    lab["rle"] = rle_codec.encode(m)
                labels.append(lab)
            # an ignore-region box (unscored category) + a crowd box
            labels.append({"id": 900 + t, "category": "other vehicle",
                           "box2d": {"x1": 0.0, "y1": 56.0,
                                     "x2": 10.0, "y2": 63.0}})
            labels.append({"id": 950 + t, "category": "car",
                           "attributes": {"crowd": True},
                           "box2d": {"x1": 86.0, "y1": 0.0,
                                     "x2": 95.0, "y2": 8.0}})
            cv2.imwrite(os.path.join(img_dir, name), img)
            frames.append({"name": name, "videoName": video,
                           "frameIndex": t, "labels": labels})
        lbl = "seg_track_20/rles" if with_mots else "box_track_20"
        lbl_dir = os.path.join(root, "labels", *lbl.split("/"))
        os.makedirs(lbl_dir, exist_ok=True)
        with open(os.path.join(lbl_dir, f"{video}.json"), "w") as f:
            json.dump(frames, f)
    # also merge per-video jsons into the single-file layout for val.json
    merged = []
    lbl_dir = os.path.join(root, "labels",
                           "seg_track_20/rles" if with_mots else "box_track_20")
    for fn in sorted(os.listdir(lbl_dir)):
        if fn.endswith(".json") and fn != "val.json":
            merged.extend(json.load(open(os.path.join(lbl_dir, fn))))
    with open(os.path.join(lbl_dir, "val.json"), "w") as f:
        json.dump(merged, f)
    return root


@pytest.fixture()
def bdd_root(tmp_path):
    return _make_fixture(str(tmp_path))


@pytest.fixture()
def bdd_mots_root(tmp_path):
    return _make_fixture(str(tmp_path), with_mots=True)


def test_scalabel_loader_and_parse(bdd_root):
    vids = load_scalabel(os.path.join(bdd_root, "labels", "box_track_20",
                                      "val.json"))
    assert set(vids) == {"vid_a", "vid_b"}
    assert len(vids["vid_a"]) == N_FRAMES
    res, _ = parse_labels(vids["vid_a"][0])
    # crowd + unscored dropped; 3 scored objects remain
    assert res.shape == (3, 6)
    assert set(res[:, 4].astype(int)) == {BDD_CLASSES.index("car"),
                                          BDD_CLASSES.index("pedestrian")}


def test_bdd_omni_two_frame_sampling(bdd_root):
    ds = BDDOmniDataset(bdd_root, split="val", max_gap=2)
    assert len(ds) == 2 * N_FRAMES
    pair = ds.pull_item_omni(3)
    assert len(pair) == 2
    (img0, res0), (img1, res1) = pair
    assert img0.shape == (H, W, 3)
    # track ids consistent across the two frames
    assert set(res0[:, 5]) == set(res1[:, 5])
    assert len(set(res0[:, 5])) == 3


def test_bdd_mots_masks(bdd_mots_root):
    ds = BDDOmniMOTSDataset(bdd_mots_root, split="val", max_gap=1)
    (img, res, masks), _ = ds.pull_item_omni(0)
    assert masks.shape == (H, W, len(res))
    for k, (x1, y1, x2, y2) in enumerate(res[:, :4].astype(int)):
        m = masks[:, :, k]
        assert m[y1:y2, x1:x2].all()
        assert m.sum() == (y2 - y1) * (x2 - x1)


def test_score_scalabel_perfect_and_degraded(bdd_root):
    gt = []
    for fn in ("vid_a", "vid_b"):
        gt.extend(load_scalabel(os.path.join(
            bdd_root, "labels", "box_track_20", "val.json"))[fn])
    # perfect predictions: copy gt scored labels with new stable ids
    preds = []
    for f in gt:
        labels = [dict(l, id=l["id"] + 1000) for l in f["labels"]
                  if l["category"] in BDD_CLASSES
                  and not (l.get("attributes") or {}).get("crowd", False)]
        preds.append({"name": f["name"], "videoName": f["videoName"],
                      "frameIndex": f["frameIndex"], "labels": labels})
    s = score_scalabel(preds, gt)
    assert s["mMOTA"] == pytest.approx(1.0)
    assert s["mIDF1"] == pytest.approx(1.0)
    assert set(s["per_class"]) == {"car", "pedestrian"}

    # predictions inside ignore regions must not count as FP
    preds_ign = [dict(p, labels=p["labels"] + [
        {"id": 5000, "category": "car",
         "box2d": {"x1": 87.0, "y1": 0.0, "x2": 94.0, "y2": 7.0}}])
        for p in preds]
    s2 = score_scalabel(preds_ign, gt)
    assert s2["mMOTA"] == pytest.approx(1.0)

    # dropping every pedestrian halves coverage for that class
    preds_deg = [dict(p, labels=[l for l in p["labels"]
                                 if l["category"] != "pedestrian"])
                 for p in preds]
    s3 = score_scalabel(preds_deg, gt)
    assert s3["per_class"]["pedestrian"]["MOTA"] <= 0.0
    assert s3["per_class"]["car"]["MOTA"] == pytest.approx(1.0)
    assert s3["mMOTA"] == pytest.approx(
        (s3["per_class"]["car"]["MOTA"]
         + s3["per_class"]["pedestrian"]["MOTA"]) / 2)


class _PerfectDriver:
    """Mock MOTOmniDriver: emits the gt boxes with stable ids."""

    def __init__(self, dataset):
        self.dataset = dataset
        self.i = 0

    def reset(self):
        pass

    def update(self, img):
        video, fi = self.dataset.index[self.i]
        frame = self.dataset.videos[video][fi]
        self.i += 1
        res, _ = parse_labels(frame)
        if len(res) == 0:
            return np.zeros((0, 5), np.float32), np.zeros(0, int), np.zeros(0, int)
        bboxes = np.concatenate([res[:, :4], np.full((len(res), 1), 0.9)], 1)
        return bboxes, res[:, 4].astype(int), res[:, 5].astype(int)


def test_bdd_evaluator_e2e_mmota(bdd_root, tmp_path):
    ds = BDDEvalDataset(bdd_root, split="val")
    assert len(ds) == 2 * N_FRAMES
    ev = BDDEvaluator(ds, (H, W))
    driver = _PerfectDriver(ds)
    results, pred_frames = ev.evaluate_mot(
        driver, out_dir=str(tmp_path / "out"))
    assert set(results) == {"vid_a", "vid_b"}
    assert os.path.exists(tmp_path / "out" / "track.json")
    s = score_scalabel(pred_frames, ds.gt_frames())
    assert s["mMOTA"] == pytest.approx(1.0)
    assert s["mIDF1"] == pytest.approx(1.0)


class _PerfectSegDriver(_PerfectDriver):
    """Mock with_mask MOTOmniDriver: gt boxes + gt masks, driver contract
    (masks on the letterbox grid, row-aligned with the returned tracks)."""

    input_size = (H, W)   # identical to the image -> r = 1, exact geometry
    last_scale = 1.0
    with_mask = True

    def update(self, img):
        video, fi = self.dataset.index[self.i]
        frame = self.dataset.videos[video][fi]
        self.i += 1
        res, rles = parse_labels(frame, with_rle=True)
        if len(res) == 0:
            return (np.zeros((0, 5), np.float32), np.zeros(0, int),
                    np.zeros(0, int), np.zeros((0, H, W), np.float32))
        bboxes = np.concatenate([res[:, :4], np.full((len(res), 1), 0.9)], 1)
        masks = np.stack([rle_codec.decode(r).astype(np.float32)
                          for r in rles])
        return bboxes, res[:, 4].astype(int), res[:, 5].astype(int), masks


def test_bdd_evaluator_seg_track_e2e(bdd_mots_root, tmp_path):
    """Full BDD MOTS loop: gt-emitting with_mask driver -> bitmask PNGs +
    seg_track.json + per-class mask-IoU scoring == 1.0 mMOTSA."""
    from PIL import Image

    from unicorn_tpu.evaluators.bdd_evaluator import score_scalabel_seg

    label_path = os.path.join(bdd_mots_root, "labels", "seg_track_20",
                              "rles", "val.json")
    ds = BDDEvalDataset(bdd_mots_root, split="val", label_path=label_path)
    ev = BDDEvaluator(ds, (H, W))
    out_dir = str(tmp_path / "out")
    results, pred_frames = ev.evaluate_seg_mot(
        _PerfectSegDriver(ds), out_dir=out_dir)
    assert set(results) == {"vid_a", "vid_b"}
    assert os.path.exists(os.path.join(out_dir, "seg_track.json"))

    # one bitmask PNG per frame, RGBA with recoverable ids/categories
    png_dir = os.path.join(out_dir, "seg_track", "vid_a")
    pngs = sorted(os.listdir(png_dir))
    assert len(pngs) == N_FRAMES
    bm = np.asarray(Image.open(os.path.join(png_dir, pngs[0])))
    assert bm.shape == (H, W, 4)
    ids_in_png = set((bm[..., 2].astype(int) * 256
                      + bm[..., 3].astype(int))[bm[..., 0] > 0].tolist())
    assert ids_in_png  # instance ids encoded in B/A channels

    s = score_scalabel_seg(pred_frames, ds.gt_frames())
    assert s["mMOTSA"] == pytest.approx(1.0)
    assert s["msMOTSA"] == pytest.approx(1.0)
    assert s["mIDF1"] == pytest.approx(1.0)


def test_bdd_mots_missing_rle_instances_dropped(bdd_mots_root):
    """Round-5 regression: an instance with box2d but no rle (box_track-style
    labels mixed into a MOTS run) was kept with an all-zero mask, supervising
    the mask head toward empty masks; such rows must be dropped instead."""
    ds = BDDOmniMOTSDataset(bdd_mots_root, split="val", max_gap=1)
    frame = ds.videos["vid_a"][0]
    dropped_id = None
    for lab in frame["labels"]:
        if "rle" in lab:
            dropped_id = lab["id"]
            del lab["rle"]
            break
    img, res, masks = ds._load_frame("vid_a", 0)
    assert res.shape[0] == 2 and masks.shape[2] == 2
    assert dropped_id not in set(res[:, 5].astype(int))
    assert (masks.sum(axis=(0, 1)) > 0).all()  # no all-zero training masks
