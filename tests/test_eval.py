"""Golden-value tests for the self-contained COCO mAP and RLE codec
(mirrors the reference's golden-value metric tests, SURVEY.md §4.3)."""
import numpy as np
import pytest

from unicorn_tpu.evaluators.coco_map import COCOMeanAP
from unicorn_tpu.evaluators import rle


def _gt_dataset():
    return {
        "images": [{"id": 1, "width": 200, "height": 200},
                   {"id": 2, "width": 200, "height": 200}],
        "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 1,
             "bbox": [10, 10, 50, 50], "area": 2500, "iscrowd": 0},
            {"id": 2, "image_id": 1, "category_id": 2,
             "bbox": [100, 100, 40, 40], "area": 1600, "iscrowd": 0},
            {"id": 3, "image_id": 2, "category_id": 1,
             "bbox": [20, 30, 60, 60], "area": 3600, "iscrowd": 0},
        ],
    }


def test_coco_map_perfect():
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": [10, 10, 50, 50], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [100, 100, 40, 40], "score": 0.8},
        {"image_id": 2, "category_id": 1, "bbox": [20, 30, 60, 60], "score": 0.95},
    ]
    m = COCOMeanAP(_gt_dataset()).evaluate(dets)
    assert abs(m["AP"] - 1.0) < 1e-6
    assert abs(m["AP50"] - 1.0) < 1e-6


def test_coco_map_miss_and_fp():
    dets = [
        # good match for gt1
        {"image_id": 1, "category_id": 1, "bbox": [11, 11, 50, 50], "score": 0.9},
        # false positive
        {"image_id": 2, "category_id": 2, "bbox": [0, 0, 30, 30], "score": 0.95},
    ]
    m = COCOMeanAP(_gt_dataset()).evaluate(dets)
    assert 0.0 < m["AP50"] < 1.0
    # cat 1: 1 of 2 gts found at iou .5 -> AP50 cat1 = 0.5; cat2: fp only -> 0
    assert abs(m["AP50"] - 0.25) < 0.01


def test_coco_map_localization_quality():
    # det overlaps gt with IoU ~0.68 -> counts at 0.5..0.65 but not 0.75
    dets = [{"image_id": 1, "category_id": 1, "bbox": [15, 15, 50, 50], "score": 0.9}]
    gt = {
        "images": [{"id": 1, "width": 200, "height": 200}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [10, 10, 50, 50], "area": 2500, "iscrowd": 0}],
    }
    m = COCOMeanAP(gt).evaluate(dets)
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert m["AP75"] == 0.0
    assert 0.0 < m["AP"] < 1.0


def test_rle_roundtrip():
    rng = np.random.RandomState(0)
    mask = (rng.rand(37, 53) > 0.5).astype(np.uint8)
    enc = rle.encode(mask)
    assert isinstance(enc["counts"], str)
    dec = rle.decode(enc)
    np.testing.assert_array_equal(dec, mask)
    assert rle.area(enc) == int(mask.sum())


def test_rle_iou():
    a = np.zeros((10, 10), np.uint8)
    a[:5] = 1
    b = np.zeros((10, 10), np.uint8)
    b[2:7] = 1
    i = rle.iou_rle([rle.encode(a)], [rle.encode(b)])
    np.testing.assert_allclose(i[0, 0], 30.0 / 70.0, rtol=1e-6)


def test_davis_jf_metrics():
    from unicorn_tpu.harness.davis_metrics import boundary_f, evaluate_davis, jaccard

    m = np.zeros((40, 50), np.uint8)
    m[10:30, 15:35] = 1
    assert jaccard(m, m) == 1.0
    assert boundary_f(m, m) == 1.0
    other = np.zeros_like(m)
    other[0:5, 0:5] = 1
    assert jaccard(m, other) == 0.0
    assert boundary_f(m, other) == 0.0
    # shifted mask: intermediate J, F tolerant to small boundary shifts
    sh = np.roll(m, 2, axis=1)
    assert 0.5 < jaccard(m, sh) < 1.0
    assert boundary_f(m, sh) > 0.5

    # sequence-level: perfect predictions -> J&F 1 (two objects)
    seq = []
    for t in range(4):
        ann = np.zeros((40, 50), np.uint8)
        ann[5 + t:15 + t, 5:20] = 1
        ann[25:35, 30 + t:45 + t] = 2
        seq.append(ann)
    res = evaluate_davis({"s": [a.copy() for a in seq]}, {"s": seq})
    assert res["J&F"] == 1.0 and res["n_objects"] == 2


def test_davis_mid_video_object_entry():
    """YouTube-VOS style: object 2 first appears at frame 2 and must still be
    scored (from the frame after its entry), not silently dropped."""
    from unicorn_tpu.harness.davis_metrics import evaluate_davis

    gts, preds_good, preds_missing2 = [], [], []
    for t in range(6):
        ann = np.zeros((40, 50), np.uint8)
        ann[5:15, 5:20] = 1
        if t >= 2:
            ann[25:35, 30:45] = 2
        gts.append(ann)
        preds_good.append(ann.copy())
        p = ann.copy()
        p[p == 2] = 0  # object 2 never predicted
        preds_missing2.append(p)

    res = evaluate_davis({"s": preds_good}, {"s": gts})
    assert res["n_objects"] == 2, "mid-video object must be scored"
    assert res["J&F"] == 1.0

    res2 = evaluate_davis({"s": preds_missing2}, {"s": gts})
    assert res2["n_objects"] == 2
    # object 1 perfect, object 2 all-miss -> mean J&F = 0.5
    assert abs(res2["J&F"] - 0.5) < 1e-9


def test_voc_evaluator_perfect_detections(tmp_path):
    """VOCEvaluator e2e on a synthetic VOC fixture: a perfect mock detector
    scores mAP 1.0; dropping one class halves it."""
    import cv2

    from unicorn_tpu.data.datasets.voc import VOC_CLASSES, VOCDetection
    from unicorn_tpu.evaluators.voc_evaluator import VOCEvaluator

    root = tmp_path / "VOC2007"
    (root / "Annotations").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    objs = [("dog", (10, 20, 50, 60)), ("cat", (60, 5, 90, 40))]
    xml = "<annotation><size><width>100</width><height>80</height>" \
          "<depth>3</depth></size>"
    for name, (a, b, c, d) in objs:
        xml += (f"<object><name>{name}</name><difficult>0</difficult>"
                f"<bndbox><xmin>{a}</xmin><ymin>{b}</ymin>"
                f"<xmax>{c}</xmax><ymax>{d}</ymax></bndbox></object>")
    xml += "</annotation>"
    for i in range(2):
        (root / "Annotations" / f"{i:06d}.xml").write_text(xml)
        cv2.imwrite(str(root / "JPEGImages" / f"{i:06d}.jpg"),
                    np.zeros((80, 100, 3), np.uint8))
    (root / "ImageSets" / "Main" / "test.txt").write_text("000000\n000001\n")

    ds = VOCDetection(str(tmp_path), image_sets=(("2007", "test"),),
                      img_size=(64, 96))
    ev = VOCEvaluator(ds, img_size=(64, 96))
    r = min(64 / 80, 96 / 100)

    gt_boxes = np.array([[9, 19, 50, 60], [59, 4, 90, 40]], np.float32)
    cls_ids = [VOC_CLASSES.index("dog"), VOC_CLASSES.index("cat")]

    def perfect(img):
        out = np.zeros((2, 7), np.float32)
        out[:, :4] = gt_boxes * r  # letterboxed coords
        out[:, 4] = 1.0
        out[:, 5] = 0.9
        out[:, 6] = cls_ids
        return out

    res = ev.evaluate(perfect)
    assert res["mAP"] == pytest.approx(1.0)

    def dogs_only(img):
        return perfect(img)[:1]

    res2 = ev.evaluate(dogs_only)
    assert res2["per_class"][VOC_CLASSES.index("dog")] == pytest.approx(1.0)
    assert res2["per_class"][VOC_CLASSES.index("cat")] == 0.0
    assert res2["mAP"] == pytest.approx(0.5)


def test_hota_perfect_tracking():
    from unicorn_tpu.evaluators.mot_metrics import hota

    gts, preds = {}, {}
    for f in range(4):
        boxes = np.array([[10 + 2 * f, 10, 30 + 2 * f, 30]], np.float32)
        gts[f] = ([1], boxes)
        preds[f] = ([7], boxes.copy())
    m = hota(gts, preds)
    assert abs(m["HOTA"] - 1.0) < 1e-9
    assert abs(m["DetA"] - 1.0) < 1e-9
    assert abs(m["AssA"] - 1.0) < 1e-9


def test_hota_id_switch_halfway():
    """One gt track, perfect boxes, pred id switches at frame 2: DetA = 1,
    every TP's association score = 2/4 = 0.5, HOTA = sqrt(0.5)."""
    from unicorn_tpu.evaluators.mot_metrics import hota

    gts, preds = {}, {}
    for f in range(4):
        boxes = np.array([[10, 10, 30, 30]], np.float32)
        gts[f] = ([1], boxes)
        preds[f] = ([100 if f < 2 else 200], boxes.copy())
    m = hota(gts, preds)
    assert abs(m["DetA"] - 1.0) < 1e-9
    assert abs(m["AssA"] - 0.5) < 1e-9
    assert abs(m["HOTA"] - np.sqrt(0.5)) < 1e-9


def test_hota_missed_and_false_detections():
    """2 gt frames; pred covers frame 0 only plus one spurious box in
    frame 1: per frame-set TP=1, FN=1, FP=1 -> DetA = 1/3; the single TP's
    association: TPA=1, FNA=1 (gt present unmatched), FPA=0 -> AssA=0.5."""
    from unicorn_tpu.evaluators.mot_metrics import hota

    box = np.array([[10, 10, 30, 30]], np.float32)
    far = np.array([[60, 60, 80, 80]], np.float32)
    gts = {0: ([1], box), 1: ([1], box)}
    preds = {0: ([5], box.copy()), 1: ([6], far)}
    m = hota(gts, preds)
    assert abs(m["DetA"] - 1.0 / 3.0) < 1e-9
    assert abs(m["AssA"] - 0.5) < 1e-9


def test_hota_score_pools_videos_with_namespaced_ids():
    """MOTEvaluator.score: two videos, each perfectly tracked but reusing
    the SAME numeric pred id — pooled HOTA must still be 1.0 because ids
    are namespaced per video (official sequence combination)."""
    from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator

    results, gts = {}, {}
    for v in ("v0", "v1"):
        frames = []
        for f in range(1, 4):
            tlwhs = [(10.0 + f, 10.0, 20.0, 20.0)]
            frames.append((f, [7], tlwhs, [0.9]))
        results[v] = frames
        gts[v] = [(f, [1], [(10.0 + f, 10.0, 20.0, 20.0)])
                  for f in range(1, 4)]
    m = MOTEvaluator.score(results, gts)
    assert abs(m["HOTA"] - 1.0) < 1e-9
    assert abs(m["MOTA"] - 1.0) < 1e-9


def test_score_suppresses_predictions_on_ignore_regions():
    """MOT17 ignore semantics (reference evaluation.py:41-53): a prediction
    Hungarian-matched to an ignore-region box at IoU >= 0.5 is removed
    before accumulation, so it is not a false positive; without the ignore
    list the same prediction costs MOTA."""
    from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator

    gt_box = (10.0, 10.0, 20.0, 20.0)
    ignore_box = (100.0, 100.0, 20.0, 20.0)
    frames = []
    for f in range(1, 4):
        # prediction 7 tracks the gt; prediction 8 sits on the ignore region
        frames.append((f, [7, 8], [gt_box, ignore_box], [0.9, 0.9]))
    results = {"v": frames}

    gts_with_ignore = {"v": [(f, [1], [gt_box], [ignore_box])
                             for f in range(1, 4)]}
    m = MOTEvaluator.score(results, gts_with_ignore)
    assert abs(m["MOTA"] - 1.0) < 1e-9, m

    gts_plain = {"v": [(f, [1], [gt_box]) for f in range(1, 4)]}
    m2 = MOTEvaluator.score(results, gts_plain)
    assert m2["MOTA"] < 1.0  # the FP counts without ignore handling

    # an ignore box suppresses at most ONE prediction (linear assignment):
    # two predictions on one ignore region -> one survives as FP
    frames2 = [(f, [7, 8, 9],
                [gt_box, ignore_box,
                 (101.0, 101.0, 20.0, 20.0)], [0.9] * 3)
               for f in range(1, 4)]
    m3 = MOTEvaluator.score({"v": frames2}, gts_with_ignore)
    assert m3["MOTA"] < 1.0


def test_mot17_ignore_pipeline_end_to_end(tmp_path):
    """gt.txt -> convert_mot (ignore regions kept as iscrowd/ignore anns)
    -> MOTEvalDataset -> load_gt_from_dataset -> ignore-aware score."""
    import json
    import os
    import sys

    d = str(tmp_path)
    vdir = os.path.join(d, "train", "MOT17-02-FRCNN")
    os.makedirs(os.path.join(vdir, "gt"))
    with open(os.path.join(vdir, "seqinfo.ini"), "w") as f:
        f.write("[Sequence]\nimWidth=640\nimHeight=480\nseqLength=3\n")
    rows = []
    for fr in (1, 2, 3):
        rows.append(f"{fr},1,10,10,20,20,1,1,1.0")    # valid pedestrian
        rows.append(f"{fr},2,100,100,20,20,0,7,0.5")  # cls=7 -> ignore region
        rows.append(f"{fr},3,300,300,20,20,0,3,0.5")  # cls=3 -> dropped
    with open(os.path.join(vdir, "gt", "gt.txt"), "w") as f:
        f.write("\n".join(rows))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from convert_datasets import convert_mot
    from track import load_gt_from_dataset

    from unicorn_tpu.data.datasets.mot import MOTEvalDataset
    from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator

    convert_mot(d, split="train")
    anns = json.load(open(os.path.join(d, "annotations", "train.json")))[
        "annotations"]
    assert sum(a.get("ignore", 0) for a in anns) == 3 and len(anns) == 6

    ds = MOTEvalDataset(data_dir=d,
                        json_file=os.path.join(d, "annotations", "train.json"),
                        name="train", img_size=(64, 96))
    gts = load_gt_from_dataset(ds)
    _, ids, _, ign = gts["MOT17-02-FRCNN"][0]
    assert ids == [1] and len(ign) == 1

    results = {"MOT17-02-FRCNN": [
        (fr, [7, 8], [(10, 10, 20, 20), (100, 100, 20, 20)], [0.9, 0.9])
        for fr in (1, 2, 3)]}
    m = MOTEvaluator.score(results, gts)
    assert abs(m["MOTA"] - 1.0) < 1e-9, m
