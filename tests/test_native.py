"""Native C++ COCOeval matcher vs the pure-python loop."""
import numpy as np
import pytest

from unicorn_tpu.csrc.bindings import evaluate_img_native, get_lib
from unicorn_tpu.evaluators.coco_map import IOU_THRS, COCOMeanAP


def python_match(ious, gt_ig, iscrowd, thresholds):
    D, G = ious.shape
    T = len(thresholds)
    dt_m = np.full((T, D), -1, np.int64)
    dt_ignore = np.zeros((T, D), bool)
    for t, thr in enumerate(thresholds):
        gt_m = np.full(G, -1, np.int64)
        for di in range(D):
            iou = min(thr, 1 - 1e-10)
            m = -1
            for gi in range(G):
                if gt_m[gi] >= 0 and not iscrowd[gi]:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gi]:
                    break
                if ious[di, gi] < iou:
                    continue
                iou = ious[di, gi]
                m = gi
            if m == -1:
                continue
            dt_ignore[t, di] = gt_ig[m]
            dt_m[t, di] = m
            gt_m[m] = di
    return dt_m, dt_ignore


def test_native_builds():
    assert get_lib() is not None, "native lib failed to build"


def test_native_matches_python():
    rng = np.random.RandomState(0)
    for trial in range(5):
        D, G = rng.randint(1, 30), rng.randint(1, 15)
        ious = rng.rand(D, G)
        gt_ig = np.zeros(G, bool)
        gt_ig[rng.rand(G) < 0.3] = True
        # sorted: non-ignored first (the caller's contract)
        order = np.argsort(gt_ig, kind="stable")
        gt_ig = gt_ig[order]
        iscrowd = gt_ig & (rng.rand(G) < 0.5)
        out = evaluate_img_native(ious, gt_ig, iscrowd, IOU_THRS)
        assert out is not None
        m_n, ig_n = out
        m_p, ig_p = python_match(ious, gt_ig, iscrowd, IOU_THRS)
        np.testing.assert_array_equal(m_n, m_p)
        np.testing.assert_array_equal(ig_n, ig_p)


def test_coco_map_with_native_same_results():
    """End-to-end: the evaluator (which now uses the native path) still
    produces the golden values from test_eval.py."""
    gt = {
        "images": [{"id": 1, "width": 200, "height": 200}],
        "categories": [{"id": 1, "name": "a"}],
        "annotations": [{"id": 1, "image_id": 1, "category_id": 1,
                         "bbox": [10, 10, 50, 50], "area": 2500, "iscrowd": 0}],
    }
    dets = [{"image_id": 1, "category_id": 1, "bbox": [15, 15, 50, 50],
             "score": 0.9}]
    m = COCOMeanAP(gt).evaluate(dets)
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert m["AP75"] == 0.0
