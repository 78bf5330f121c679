"""MOTS quadrant tests: tracker return_index mask realignment, mask-IoU
CLEAR-MOT metrics (MOTSA/sMOTSA/MOTSP/mMOTSA) with hand-computed golden
values, MOTS-Challenge txt round-trip, the evaluate_omni_mots synthetic e2e
(crowded scene where score order != input order — the round-4 misalignment
bug class), and the BDD seg_track bitmask/scoring surface.

Reference counterparts: unicorn/evaluators/mot_evaluator.py:844-869 (mask
realignment + merge), external/qdtrack/qdtrack/core/evaluation/mots.py:14-93
(mask-IoU CLEAR-MOT), core/to_bdd100k (bitmask submission).
"""
import os

import numpy as np
import pytest

from unicorn_tpu.evaluators import rle as rle_codec
from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator, merge_mots_masks
from unicorn_tpu.evaluators.mots_metrics import (
    load_mots_txt, mask_iou_matrix, score_mots, score_mots_per_class,
    score_mots_txt, write_mots_txt,
)
from unicorn_tpu.tracker.qd_tracker import QuasiDenseEmbedTracker


def _rect_mask(h, w, y1, y2, x1, x2):
    m = np.zeros((h, w), np.uint8)
    m[y1:y2, x1:x2] = 1
    return m


def _rect_rle(h, w, y1, y2, x1, x2):
    return rle_codec.encode(_rect_mask(h, w, y1, y2, x1, x2))


# ---------------------------------------------------------------------------
# return_index contract
# ---------------------------------------------------------------------------
def test_qd_tracker_return_index_realigns_any_input_order():
    """Outputs are score-sorted and duplicate-suppressed; index must map each
    output row to its ORIGINAL input row regardless of input order."""
    trk = QuasiDenseEmbedTracker(init_score_thr=0.5, obj_score_thr=0.3,
                                 match_score_thr=0.5)
    rng = np.random.RandomState(3)
    # 5 well-separated boxes + 1 near-duplicate of box 2 (lower score, high
    # IoU -> suppressed by the class-NMS pass)
    base = np.array([[10, 10, 30, 30], [50, 10, 70, 30], [90, 10, 110, 30],
                     [10, 50, 30, 70], [50, 50, 70, 70]], np.float32)
    dup = base[2] + np.array([1, 1, 1, 1], np.float32)
    boxes = np.concatenate([base, dup[None]], 0)
    scores = np.array([0.6, 0.95, 0.8, 0.7, 0.9, 0.75], np.float32)
    bboxes5 = np.concatenate([boxes, scores[:, None]], 1)
    labels = np.zeros(6, int)
    embeds = rng.randn(6, 16).astype(np.float32) * 10

    out_b, out_l, ids, index = trk.match(bboxes5, labels, embeds, 0,
                                         return_index=True)
    # the duplicate (input row 5) must be suppressed
    assert len(out_b) == 5
    assert 5 not in index.tolist()
    # index realigns: output rows equal the original rows they came from
    np.testing.assert_allclose(out_b, bboxes5[index])
    np.testing.assert_array_equal(out_l, labels[index])
    # and the output is score-descending (the reference's contract)
    assert (np.diff(out_b[:, 4]) <= 1e-6).all()

    # payload realignment: a per-detection payload gathered by index lands
    # on the matching output row
    payload = np.arange(6)
    np.testing.assert_array_equal(out_b[:, 4],
                                  scores[payload[index]])


def test_qd_tracker_return_index_consistent_across_frames():
    trk = QuasiDenseEmbedTracker(init_score_thr=0.5, obj_score_thr=0.3)
    rng = np.random.RandomState(0)
    emb = rng.randn(3, 8).astype(np.float32) * 8
    for frame in range(4):
        order = rng.permutation(3)
        boxes = np.array([[10, 10, 30, 30], [60, 10, 80, 30],
                          [10, 60, 30, 80]], np.float32)[order]
        scores = np.array([0.9, 0.8, 0.85], np.float32)[order]
        b5 = np.concatenate([boxes, scores[:, None]], 1)
        ob, ol, ids, idx = trk.match(b5, np.zeros(3, int), emb[order],
                                     frame, return_index=True)
        np.testing.assert_allclose(ob, b5[idx])


# ---------------------------------------------------------------------------
# mask-IoU metrics: golden values
# ---------------------------------------------------------------------------
def test_mask_iou_matrix_exact():
    h = w = 20
    g = [_rect_rle(h, w, 2, 8, 2, 8), _rect_rle(h, w, 12, 18, 12, 18)]
    p = [_rect_rle(h, w, 2, 8, 4, 10), _rect_rle(h, w, 12, 18, 12, 18)]
    iou = mask_iou_matrix(g, p)
    # 6x6 squares, pred 0 shifted 2 px right: inter 24, union 48
    assert iou.shape == (2, 2)
    assert abs(iou[0, 0] - 0.5) < 1e-6
    assert abs(iou[1, 1] - 1.0) < 1e-6
    assert iou[0, 1] == 0.0 and iou[1, 0] == 0.0


def test_score_mots_golden_values():
    """Hand-computed scenario: track A perfect 3 frames; track B misses frame
    2 and returns with a new id on frame 3 (1 FN + 1 IDSW).

    num_gt=6, FN=1, FP=0, IDSW=1, sum_iou=5.0:
      MOTSA = 1 - 2/6 = 0.6667; sMOTSA = (5-0-1)/6 = 0.6667; MOTSP = 1.0;
      idtp = |A<->10| + |B<->20| = 3 + 1 -> IDF1 = 2*4/(6+5) = 0.7273.
    """
    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)
    B = _rect_rle(h, w, 12, 18, 12, 18)
    gts = {"v": [(1, [1, 2], [A, B]),
                 (2, [1, 2], [A, B]),
                 (3, [1, 2], [A, B])]}
    results = {"v": [(1, [10, 20], [A, B]),
                     (2, [10], [A]),
                     (3, [10, 21], [A, B])]}
    m = score_mots(results, gts)
    assert abs(m["MOTSA"] - 4 / 6) < 1e-9
    assert abs(m["sMOTSA"] - 4 / 6) < 1e-9
    assert abs(m["MOTSP"] - 1.0) < 1e-9
    assert abs(m["IDF1"] - 8 / 11) < 1e-9
    assert m["IDsw"] == 1 and m["FP"] == 0 and m["FN"] == 1
    assert m["num_gt"] == 6


def test_score_mots_soft_tp_credit():
    """sMOTSA credits matched masks by IoU (not 1.0): a single matched pair
    at IoU=0.5 gives sMOTSA=0.5 while MOTSA=1.0."""
    h = w = 20
    gts = {"v": [(1, [1], [_rect_rle(h, w, 2, 8, 2, 8)])]}
    results = {"v": [(1, [7], [_rect_rle(h, w, 2, 8, 4, 10)])]}
    m = score_mots(results, gts)
    assert abs(m["MOTSA"] - 1.0) < 1e-9
    assert abs(m["sMOTSA"] - 0.5) < 1e-9
    assert abs(m["MOTSP"] - 0.5) < 1e-9


def test_score_mots_fp_on_gt_empty_frame():
    """A hypothesis on a frame with NO gt entry is an FP, not free (official
    mots-tools evaluates every frame; regression for the gt-frames-only
    accumulation bug)."""
    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)
    gts = {"v": [(1, [1], [A])]}
    results = {"v": [(1, [7], [A]), (2, [7], [A])]}
    m = score_mots(results, gts)
    assert m["FP"] == 1 and m["FN"] == 0, m
    assert abs(m["sMOTSA"] - 0.0) < 1e-9  # (1.0 soft TP - 1 FP) / 1 gt


def test_score_mots_per_class_fp_without_class_gt():
    """Predictions of a class on frames (or videos) with no gt of that class
    count as FPs in that class's accumulator (the box sibling updates every
    class on every frame; regression for the per-class split bug)."""
    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)
    B = _rect_rle(h, w, 12, 18, 12, 18)
    gts = {"v": [(1, [1], [1], [A])]}
    results = {"v": [(1, [5, 6], [1, 1], [A, B]),  # B: FP, same frame
                     (2, [5], [1], [A])]}          # frame 2: no class-1 gt
    m = score_mots_per_class(results, gts)
    assert m["per_class"][1]["FP"] == 2, m["per_class"]
    # a class predicted but absent from gt everywhere pools FPs into
    # overall without entering the class means
    results2 = {"v": [(1, [5, 9], [1, 3], [A, B])]}
    m2 = score_mots_per_class(results2, gts)
    assert 3 not in m2["per_class"]
    assert m2["overall"]["FP"] == 1, m2["overall"]


def test_score_mots_per_class_mmotsa():
    """Class averaging (BDD protocol): class 0 perfect, class 1 all missed
    -> mMOTSA = (1.0 + (-? actually 1 - FN/num_gt = 0)) / 2 = 0.5."""
    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)
    B = _rect_rle(h, w, 12, 18, 12, 18)
    gts = {"v": [(1, [1, 2], [0, 1], [A, B]),
                 (2, [1, 2], [0, 1], [A, B])]}
    results = {"v": [(1, [5], [0], [A]), (2, [5], [0], [A])]}
    m = score_mots_per_class(results, gts)
    assert abs(m["per_class"][0]["MOTSA"] - 1.0) < 1e-9
    assert abs(m["per_class"][1]["MOTSA"] - 0.0) < 1e-9
    assert abs(m["mMOTSA"] - 0.5) < 1e-9


# ---------------------------------------------------------------------------
# MOTS-Challenge txt round-trip
# ---------------------------------------------------------------------------
def test_mots_txt_roundtrip(tmp_path):
    h, w = 24, 32
    rng = np.random.RandomState(1)
    frames = []
    for fid in (1, 2):
        masks = [(rng.rand(h, w) > 0.6).astype(np.uint8) for _ in range(2)]
        frames.append((fid, [2001, 2002], [2, 2],
                       [rle_codec.encode(m) for m in masks]))
    path = str(tmp_path / "seq.txt")
    write_mots_txt(path, frames)
    back = load_mots_txt(path)
    assert [f[0] for f in back] == [1, 2]
    for orig, rt in zip(frames, back):
        assert orig[1] == rt[1] and orig[2] == rt[2]
        for ro, rr in zip(orig[3], rt[3]):
            np.testing.assert_array_equal(rle_codec.decode(ro),
                                          rle_codec.decode(rr))


def test_score_mots_txt_equals_direct(tmp_path):
    """Writing results + gt as MOTS txt and scoring the files reproduces the
    in-memory score (ids relabel consistently; CLEAR metrics are invariant
    to relabeling)."""
    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)
    B = _rect_rle(h, w, 12, 18, 12, 18)
    gts = {"v": [(1, [1, 2], [A, B]), (2, [1, 2], [A, B]),
                 (3, [1, 2], [A, B])]}
    results = {"v": [(1, [10, 20], [A, B]), (2, [10], [A]),
                     (3, [10, 21], [A, B])]}
    direct = score_mots(results, gts)

    rdir = tmp_path / "res"
    gdir = tmp_path / "gt"
    write_mots_txt(str(rdir / "v.txt"),
                   [(f, [2000 + i for i in ids], [2] * len(ids), rles)
                    for f, ids, rles in results["v"]])
    write_mots_txt(str(gdir / "v.txt"),
                   [(f, [2000 + i for i in ids], [2] * len(ids), rles)
                    for f, ids, rles in gts["v"]])
    via_txt = score_mots_txt(str(rdir), {"v": str(gdir / "v.txt")},
                             class_id=2)
    for k in ("sMOTSA", "MOTSA", "MOTSP", "IDF1", "IDsw", "FP", "FN"):
        assert abs(direct[k] - via_txt[k]) < 1e-9, (k, direct[k], via_txt[k])


# ---------------------------------------------------------------------------
# merge_mots_masks: reference merge semantics
# ---------------------------------------------------------------------------
def test_merge_mots_masks_ascending_id_priority():
    """Reference order (mot_evaluator.py:853-869): kept rows sort to
    ascending id; on overlap the LOWER id keeps the contested pixels."""
    img_size = (20, 20)
    h, w = 20, 20  # r = 1
    masks = np.zeros((2, 20, 20), np.float32)
    masks[0, 5:15, 5:15] = 1.0   # id 7
    masks[1, 5:15, 10:18] = 1.0  # id 3 overlaps columns 10:15
    ids = np.array([7, 3])
    labels = np.array([0, 0])
    scores = np.array([0.9, 0.8])
    boxes = np.array([[5, 5, 15, 15, 0.9], [10, 5, 18, 15, 0.8]], np.float32)
    out_ids, out_labels, out_scores, tlwhs, rles = merge_mots_masks(
        ids, labels, scores, boxes, masks, 0.5, 1.0, (h, w), img_size)
    assert out_ids == [3, 7]  # ascending id order
    m3 = rle_codec.decode(rles[0])
    m7 = rle_codec.decode(rles[1])
    # id 3 keeps its full rectangle; id 7 loses the contested strip
    assert m3[6, 12] == 1 and m7[6, 12] == 0
    assert m7[6, 6] == 1
    assert not (m3 & m7).any()


def test_merge_mots_masks_resizes_to_original_resolution():
    img_size = (32, 32)
    h, w = 16, 24  # r = min(32/16, 32/24) = 4/3; content = 21.3x32 -> 21x32
    r = min(img_size[0] / h, img_size[1] / w)
    masks = np.zeros((1, 32, 32), np.float32)
    masks[0, :int(8 * r), :int(12 * r)] = 1.0  # letterbox-space rectangle
    ids, labels, scores = np.array([1]), np.array([0]), np.array([0.9])
    boxes = np.array([[0, 0, 12, 8, 0.9]], np.float32)
    _, _, _, _, rles = merge_mots_masks(ids, labels, scores, boxes, masks,
                                        0.5, r, (h, w), img_size)
    m = rle_codec.decode(rles[0])
    assert m.shape == (h, w)
    gt = _rect_mask(h, w, 0, 8, 0, 12)
    inter = (m & gt).sum()
    union = (m | gt).sum()
    assert inter / union > 0.8


# ---------------------------------------------------------------------------
# evaluate_omni_mots synthetic e2e: score order != input order
# ---------------------------------------------------------------------------
class FakeMOTSDataset:
    """One video, 3 diagonal-moving squares; input detection order differs
    from score order every frame, plus a suppressed near-duplicate — the
    configuration that silently corrupted masks before return_index."""

    img_size = (64, 64)

    def __init__(self, n_frames=8, hw=(48, 56)):
        self.hw = hw
        self.items = []
        self.gt = {"vid0": []}
        starts = np.array([[4.0, 4.0], [28.0, 4.0], [4.0, 26.0]])
        vels = np.array([[1.0, 0.5], [-0.5, 1.0], [1.0, 0.0]])
        self.size = 12.0
        for t in range(n_frames):
            pos = starts + t * vels
            boxes = np.concatenate([pos, pos + self.size], 1)
            self.items.append((t + 1, boxes.copy()))
            h, w = hw
            rles = []
            for b in boxes:
                rles.append(_rect_rle(h, w, int(round(b[1])),
                                      int(round(b[3])), int(round(b[0])),
                                      int(round(b[2]))))
            self.gt["vid0"].append((t + 1, [1, 2, 3], rles))

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        frame_id, boxes = self.items[i]
        h, w = self.hw
        img = np.zeros((h, w, 3), np.float32)
        info = (h, w, frame_id, 0, f"vid0/img1/{frame_id:06d}.jpg")
        return img, boxes, info, np.array([i])


def test_evaluate_omni_mots_scores_masks(tmp_path):
    ds = FakeMOTSDataset()
    r = min(ds.img_size[0] / ds.hw[0], ds.img_size[1] / ds.hw[1])
    Hl, Wl = ds.img_size  # mask grid at letterbox resolution (stride 1)
    counter = {"i": 0}
    # distinct scores so the tracker's score sort PERMUTES the input rows:
    # input order obj0,obj1,obj2,dup -> score order obj1,obj2,dup?,obj0
    obj_scores = np.array([0.7, 0.95, 0.85], np.float32)

    def whole_mask_fn(params, frame):
        frame_id, boxes = ds.items[counter["i"]]
        counter["i"] += 1
        n = len(boxes)
        dets = np.zeros((8, 7), np.float32)
        masks = np.zeros((8, Hl, Wl), np.float32)
        dets[:n, :4] = boxes * r
        dets[:n, 4] = obj_scores
        dets[:n, 5] = 1.0
        for k, b in enumerate(boxes * r):
            masks[k, int(round(b[1])):int(round(b[3])),
                  int(round(b[0])):int(round(b[2]))] = 1.0
        # near-duplicate of obj1 at lower score: tracker's duplicate pass
        # drops it, shortening the output vs the input (the case the old
        # min() clamp papered over)
        dets[n, :4] = boxes[1] * r + 0.5
        dets[n, 4] = 0.8
        dets[n, 5] = 1.0
        masks[n] = masks[1]
        valid = np.zeros((8,), bool)
        valid[: n + 1] = True
        return dets, valid, np.zeros((1, 4, 4, 8), np.float32), masks

    def embed_fn(params, feat_prev, feat_cur, centers):
        centers = np.asarray(centers, np.float64)
        ang = centers @ np.array([[0.05, 0.21], [0.17, 0.03]])
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=1) * 4

    ev = MOTEvaluator(dataset=ds)
    results = ev.evaluate_omni_mots(
        whole_mask_fn, embed_fn, None, result_dir=str(tmp_path),
        qd_params=dict(init_score_thr=0.6, obj_score_thr=0.3,
                       match_score_thr=0.5))
    assert set(results) == {"vid0"}

    m = MOTEvaluator.score_mots(results, ds.gt)
    # masks aligned with the right tracks: near-perfect mask tracking
    assert m["IDsw"] == 0, m
    assert m["MOTSA"] > 0.95, m
    assert m["sMOTSA"] > 0.75, m  # soft credit: rasterize/resize rounding

    # per-frame alignment check (the misalignment bug's direct symptom):
    # every output mask overlaps ITS OWN gt rectangle dominantly
    gt_by_frame = {f[0]: f for f in ds.gt["vid0"]}
    tid_to_gt = {}
    for frame in results["vid0"]:
        frame_id, tids, tlwhs, scores, rles = frame
        assert len(tids) == 3  # duplicate suppressed, all objects kept
        g = gt_by_frame[frame_id]
        iou = mask_iou_matrix(g[2], rles)
        for j, tid in enumerate(tids):
            best_gt = int(np.argmax(iou[:, j]))
            assert iou[best_gt, j] > 0.6, (frame_id, tid, iou[:, j])
            # a track must stay on one gt object for its whole life
            assert tid_to_gt.setdefault(tid, best_gt) == best_gt

    # written MOTS-Challenge txt round-trips and decodes disjointly
    txt = load_mots_txt(str(tmp_path / "vid0.txt"))
    assert len(txt) == len(ds.items)
    for fid, ids, clss, rles in txt:
        assert all(c == 2 for c in clss)
        assert all(i >= 2000 for i in ids)
        dense = [rle_codec.decode(x) for x in rles]
        assert all(d.shape == ds.hw for d in dense)
        total = np.zeros(ds.hw, np.int32)
        for d in dense:
            total += d
        assert total.max() <= 1, "per-frame masks must be disjoint"

    # txt-level scoring reproduces the in-memory numbers
    gdir = tmp_path / "gt"
    write_mots_txt(str(gdir / "vid0.txt"),
                   [(f, [2000 + i for i in ids], [2] * len(ids), rles)
                    for f, ids, rles in ds.gt["vid0"]])
    via_txt = score_mots_txt(str(tmp_path), {"vid0": str(gdir / "vid0.txt")},
                             class_id=2)
    for k in ("sMOTSA", "MOTSA", "IDsw", "FP", "FN"):
        assert abs(via_txt[k] - m[k]) < 1e-9, (k, via_txt[k], m[k])


# ---------------------------------------------------------------------------
# BDD seg_track: bitmask encoding + per-class mask scoring
# ---------------------------------------------------------------------------
def test_write_bdd_bitmask_encoding(tmp_path):
    from PIL import Image

    from unicorn_tpu.evaluators.bdd_evaluator import write_bdd_bitmask

    h = w = 16
    masks = np.zeros((2, h, w), bool)
    masks[0, 2:8, 2:8] = True
    masks[1, 6:12, 6:12] = True  # overlaps mask 0 in [6:8, 6:8]
    ids = [300, 77]
    classes = [2, 0]  # car, pedestrian (0-based)
    scores = [0.9, 0.5]
    path = str(tmp_path / "seg_track" / "vid" / "f1.png")
    write_bdd_bitmask(path, masks, ids, classes, scores)
    bm = np.asarray(Image.open(path))
    assert bm.shape == (h, w, 4)
    # mask 0 (score 0.9, painted last) wins the contested pixels
    assert tuple(bm[7, 7]) == (3, 0, 300 >> 8, 300 & 255)
    assert tuple(bm[3, 3]) == (3, 0, 300 >> 8, 300 & 255)
    assert tuple(bm[10, 10]) == (1, 0, 0, 77)
    assert tuple(bm[0, 0]) == (0, 0, 0, 0)
    # id recovers from the B/A channels
    assert int(bm[7, 7, 2]) * 256 + int(bm[7, 7, 3]) == 300


def test_score_scalabel_seg_golden():
    from unicorn_tpu.evaluators.bdd_evaluator import score_scalabel_seg

    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)
    B = _rect_rle(h, w, 12, 18, 12, 18)

    def frame(video, fi, labs):
        return {"videoName": video, "frameIndex": fi,
                "labels": [{"id": i, "category": c, "rle": r}
                           for i, c, r in labs]}

    gt = [frame("v", 0, [(1, "car", A), (2, "pedestrian", B)]),
          frame("v", 1, [(1, "car", A), (2, "pedestrian", B)])]
    # car tracked perfectly; pedestrian missed entirely
    pred = [frame("v", 0, [(9, "car", A)]), frame("v", 1, [(9, "car", A)])]
    m = score_scalabel_seg(pred, gt)
    per = m["per_class"]
    # classes keyed by _CLS_INDEX: car=2, pedestrian=0
    assert abs(per[2]["MOTSA"] - 1.0) < 1e-9
    assert abs(per[0]["MOTSA"] - 0.0) < 1e-9
    assert abs(m["mMOTSA"] - 0.5) < 1e-9
    assert abs(m["msMOTSA"] - 0.5) < 1e-9


def test_score_mots_txt_class10_ignore_regions(tmp_path):
    """MOTS-Challenge gt class-10 rows are ignore regions: an UNMATCHED
    prediction mostly inside one is absorbed (not an FP); a prediction
    matched to a real gt object is immune even if it overlaps the region
    (official mots-tools semantics)."""
    from unicorn_tpu.evaluators.mots_metrics import (
        score_mots_txt, write_mots_txt)

    h = w = 30
    PED = _rect_rle(h, w, 2, 10, 2, 10)          # real pedestrian
    IGN = _rect_rle(h, w, 15, 30, 0, 30)         # class-10 ignore region
    GHOST = _rect_rle(h, w, 18, 26, 5, 13)       # unmatched pred in region
    gt_dir, res_dir = tmp_path / "gt", tmp_path / "res"
    write_mots_txt(str(gt_dir / "v.txt"),
                   [(f, [2001, 10000], [2, 10], [PED, IGN])
                    for f in (1, 2)])
    write_mots_txt(str(res_dir / "v.txt"),
                   [(f, [2005, 2006], [2, 2], [PED, GHOST])
                    for f in (1, 2)])
    m = score_mots_txt(str(res_dir), {"v": str(gt_dir / "v.txt")},
                       class_id=2)
    assert m["FP"] == 0 and m["FN"] == 0, m
    assert abs(m["MOTSA"] - 1.0) < 1e-9, m
    # counterfactual: without the class-10 row the ghost is an FP per frame
    write_mots_txt(str(gt_dir / "v.txt"),
                   [(f, [2001], [2], [PED]) for f in (1, 2)])
    m2 = score_mots_txt(str(res_dir), {"v": str(gt_dir / "v.txt")},
                        class_id=2)
    assert m2["FP"] == 2, m2
    # matched prediction overlapping the region still scores (immunity):
    # move the real gt INTO the ignore region footprint
    PED_IN = _rect_rle(h, w, 18, 26, 5, 13)
    write_mots_txt(str(gt_dir / "v.txt"),
                   [(f, [2001, 10000], [2, 10], [PED_IN, IGN])
                    for f in (1, 2)])
    write_mots_txt(str(res_dir / "v.txt"),
                   [(f, [2005], [2], [PED_IN]) for f in (1, 2)])
    m3 = score_mots_txt(str(res_dir), {"v": str(gt_dir / "v.txt")},
                        class_id=2)
    assert abs(m3["MOTSA"] - 1.0) < 1e-9 and m3["FN"] == 0, m3
    # default class_id=None: class-10 rows must act ONLY as ignore regions,
    # never as scoreable gt objects (no spurious FN per region per frame)
    m4 = score_mots_txt(str(res_dir), {"v": str(gt_dir / "v.txt")})
    assert abs(m4["MOTSA"] - 1.0) < 1e-9 and m4["FN"] == 0 \
        and m4["FP"] == 0, m4


def test_score_scalabel_seg_crowd_ignore_regions():
    """Crowd-attributed / unscored-category gt masks become ignore
    REGIONS (reference eval_mots -> preprocessResult): a prediction
    mostly inside one is suppressed, not an FP; the crowd mask is not a
    gt row; predictions outside ignore regions still score normally."""
    from unicorn_tpu.evaluators.bdd_evaluator import score_scalabel_seg

    h = w = 20
    A = _rect_rle(h, w, 2, 8, 2, 8)            # real car gt
    CROWD = _rect_rle(h, w, 10, 20, 10, 20)    # crowd region
    IN_CROWD = _rect_rle(h, w, 12, 18, 12, 18)  # pred inside the crowd

    def frame(video, fi, labs):
        return {"videoName": video, "frameIndex": fi, "labels": labs}

    def lab(i, c, r, crowd=False):
        d = {"id": i, "category": c, "rle": r}
        if crowd:
            d["attributes"] = {"crowd": True}
        return d

    gt = [frame("v", fi, [lab(1, "car", A),
                          lab(99, "car", CROWD, crowd=True)])
          for fi in (0, 1)]
    pred = [frame("v", fi, [lab(9, "car", A), lab(10, "car", IN_CROWD)])
            for fi in (0, 1)]
    m = score_scalabel_seg(pred, gt)
    # the in-crowd prediction is forgiven -> perfect car tracking
    assert abs(m["per_class"][2]["MOTSA"] - 1.0) < 1e-9, m
    assert m["per_class"][2]["FP"] == 0, m
    # without the crowd region it would be an FP every frame
    gt_plain = [frame("v", fi, [lab(1, "car", A)]) for fi in (0, 1)]
    m2 = score_scalabel_seg(pred, gt_plain)
    assert m2["per_class"][2]["FP"] == 2, m2
    # an "other person" (unscored category) mask also acts as ignore
    gt_other = [frame("v", fi, [lab(1, "car", A),
                                lab(99, "other person", CROWD)])
                for fi in (0, 1)]
    m3 = score_scalabel_seg(pred, gt_other)
    assert m3["per_class"][2]["FP"] == 0, m3


def test_bdd_evaluate_seg_mot_e2e(tmp_path):
    """Driver-level BDD MOTS loop with a stub driver: bitmask PNGs +
    seg_track.json written, per-class mMOTSA scored from the returned
    scalabel frames."""
    from unicorn_tpu.evaluators.bdd_evaluator import (
        BDDEvaluator, score_scalabel_seg,
    )

    h, w = 32, 40
    img_size = (48, 48)
    r = min(img_size[0] / h, img_size[1] / w)

    class StubDataset:
        def __init__(self):
            self.frames = []
            for t in range(4):
                x = 4 + 2 * t
                self.frames.append((t, np.array([[x, 6, x + 10, 18]],
                                                np.float32)))
        img_size = (48, 48)

        def __len__(self):
            return len(self.frames)

        def pull_item(self, i):
            t, boxes = self.frames[i]
            img = np.zeros((h, w, 3), np.float32)
            info = (h, w, t, 0, f"vidA/frame{t:04d}.jpg")
            return img, boxes, info, np.array([i])

    ds = StubDataset()

    class StubDriver:
        input_size = img_size
        last_scale = r
        with_mask = True

        def reset(self):
            pass

        def update(self, img):
            t = counter["i"]
            counter["i"] += 1
            _, boxes = ds.frames[t]
            b = boxes[0]
            bb = np.array([[b[0], b[1], b[2], b[3], 0.9]], np.float32)
            masks = np.zeros((1,) + img_size, np.float32)
            lb = b * r
            masks[0, int(lb[1]):int(lb[3]), int(lb[0]):int(lb[2])] = 1.0
            return bb, np.array([2]), np.array([5]), masks

    counter = {"i": 0}
    ev = BDDEvaluator(ds, img_size)
    out_dir = str(tmp_path / "bdd")
    results, pred_frames = ev.evaluate_seg_mot(StubDriver(), out_dir=out_dir)
    assert os.path.exists(os.path.join(out_dir, "seg_track.json"))
    pngs = []
    for root, _dirs, files in os.walk(os.path.join(out_dir, "seg_track")):
        pngs += [f for f in files if f.endswith(".png")]
    assert len(pngs) == 4

    # gt = the same rectangles at image resolution
    gt_frames = []
    for t, boxes in ds.frames:
        b = boxes[0].astype(int)
        gt_frames.append({
            "videoName": "vidA", "frameIndex": t,
            "labels": [{"id": 1, "category": "car",
                        "rle": _rect_rle(h, w, b[1], b[3], b[0], b[2])}],
        })
    m = score_scalabel_seg(pred_frames, gt_frames)
    assert m["per_class"][2]["MOTSA"] > 0.99, m
    assert m["per_class"][2]["sMOTSA"] > 0.6, m
    assert m["mMOTSA"] > 0.99, m
