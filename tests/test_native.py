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


def _force_python_rle(monkeypatch):
    """Disable every native RLE entry point so rle.py takes its fallbacks."""
    from unicorn_tpu.evaluators import rle

    for fn in ("rle_encode_native", "rle_decode_native", "rle_to_string_native",
               "rle_from_string_native", "rle_iou_native",
               "rle_merge_native"):
        monkeypatch.setattr(rle._native, fn, lambda *a, **k: None)


def _random_masks(rng, n, h, w):
    masks = []
    for _ in range(n):
        m = np.zeros((h, w), np.uint8)
        for _b in range(rng.randint(1, 4)):  # blocky + speckle structure
            y, x = rng.randint(0, h), rng.randint(0, w)
            dy, dx = rng.randint(1, h // 2 + 1), rng.randint(1, w // 2 + 1)
            m[y:y + dy, x:x + dx] = 1
        m ^= (rng.rand(h, w) < 0.02).astype(np.uint8)
        masks.append(m)
    return masks


def test_rle_native_python_parity(monkeypatch):
    """Native C++ RLE codec == pure-python forms on random masks, and both
    round-trip exactly (encode -> compress -> decompress -> decode)."""
    from unicorn_tpu.evaluators import rle

    assert get_lib() is not None
    rng = np.random.RandomState(1)
    masks = _random_masks(rng, 6, 37, 53) + [
        np.zeros((11, 7), np.uint8), np.ones((11, 7), np.uint8)]
    native = [rle.encode(m) for m in masks]
    native_dec = [rle.decode(r) for r in native]
    native_area = [rle.area(r) for r in native]
    native_iou = rle.iou_rle(native[:4], native[4:6],
                             iscrowd=[False, True])
    native_merge = rle.merge([rle.encode_counts(m) for m in masks[:3]])

    _force_python_rle(monkeypatch)
    for m, r, d, a in zip(masks, native, native_dec, native_area):
        py = rle.encode(m)
        assert py == r  # identical compressed string
        np.testing.assert_array_equal(rle.decode(py), m)
        np.testing.assert_array_equal(d, m)
        assert a == int(m.sum())
    py_iou = rle.iou_rle(native[:4], native[4:6],
                         iscrowd=[False, True])
    np.testing.assert_allclose(native_iou, py_iou, atol=1e-9)
    py_merge = rle.merge([rle.encode_counts(m) for m in masks[:3]])
    assert native_merge == py_merge
    np.testing.assert_array_equal(
        rle.decode_counts(native_merge),
        (masks[0] | masks[1] | masks[2]).astype(np.uint8))


def test_rle_merge_intersect():
    from unicorn_tpu.evaluators import rle

    a = np.zeros((9, 9), np.uint8)
    a[2:7, 2:7] = 1
    b = np.zeros((9, 9), np.uint8)
    b[4:9, 4:9] = 1
    out = rle.merge([rle.encode_counts(a), rle.encode_counts(b)],
                    intersect=True)
    np.testing.assert_array_equal(rle.decode_counts(out), a & b)


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


def test_native_pack_matches_numpy():
    """csrc/pack.cpp space-to-depth == the numpy reference, bit-exact."""
    import numpy as np

    from unicorn_tpu.csrc.bindings import pack_frames_s2d4

    if pack_frames_s2d4(np.zeros((1, 8, 8, 3), np.uint8)) is None:
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (3, 32, 48, 3)).astype(np.uint8)
    n, h, w, c = frames.shape
    xp = frames.reshape(n, h // 4, 4, w // 4, 4, c)
    ref = np.ascontiguousarray(xp.transpose(0, 1, 3, 2, 4, 5)).reshape(
        n, h // 4, w // 4, 16 * c)
    np.testing.assert_array_equal(pack_frames_s2d4(frames), ref)
