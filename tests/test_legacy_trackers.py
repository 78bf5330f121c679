"""Legacy association baselines (tracker/legacy.py): SORT, DeepSORT, MOTDT.

The reference's evaluate_sort / evaluate_deepsort / evaluate_motdt branches
are unrunnable there (tracker modules absent, imports commented out,
mot_evaluator.py:17-19), so there is no executable behavior anchor; these
tests pin the published algorithms' defining behaviors instead — SORT's
min_hits/max_age lifecycle, DeepSORT's appearance cascade (identity through
an IoU-ambiguous crossing, re-id after occlusion), MOTDT's tracked-candidate
bridging — plus the MOTEvaluator integration for all three.
"""
import numpy as np
import pytest

from unicorn_tpu.tracker.legacy import DeepSort, OnlineTracker, Sort


def _box(cx, cy, w=10.0, h=12.0):
    return [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2]


# ---------------------------------------------------------------------------
# SORT
# ---------------------------------------------------------------------------

def test_sort_identity_and_min_hits():
    trk = Sort(det_thresh=0.5, min_hits=3, max_age=5)
    ids_per_frame = []
    for t in range(10):
        boxes = np.array([_box(20 + 2 * t, 30), _box(60, 40 + 1.5 * t)])
        out = trk.update(boxes, np.array([0.9, 0.8]))
        ids_per_frame.append(sorted(out[:, 4].astype(int).tolist()))
    # first min_hits frames output immediately (frame_count <= min_hits rule)
    assert ids_per_frame[0] == [1, 2]
    # identities are stable for linear motion
    assert all(ids == [1, 2] for ids in ids_per_frame)

    # a target born mid-sequence is gated by min_hits: the birth detection
    # starts the streak at 0 (original KalmanBoxTracker), so it first emits
    # on its 4th consecutive frame
    appeared = []
    for t in range(10, 15):
        boxes = np.array([_box(20 + 2 * t, 30), _box(60, 40 + 1.5 * t),
                          _box(100, 100 + t)])
        out = trk.update(boxes, np.array([0.9, 0.8, 0.9]))
        appeared.append(3 in out[:, 4].astype(int).tolist())
    assert appeared == [False, False, False, True, True]


def test_sort_max_age_expiry_new_id():
    trk = Sort(det_thresh=0.5, min_hits=1, max_age=2)
    for t in range(5):
        trk.update(np.array([_box(50, 50)]), np.array([0.9]))
    # vanish for max_age+1 frames -> row dropped
    for _ in range(3):
        out = trk.update(np.zeros((0, 4)), np.zeros((0,)))
        assert len(out) == 0
    # reappear: a fresh identity is minted (first frame back emits nothing —
    # even min_hits=1 needs one post-birth match)
    out = trk.update(np.array([_box(50, 50)]), np.array([0.9]))
    assert len(out) == 0
    out = trk.update(np.array([_box(50, 50)]), np.array([0.9]))
    assert int(out[0, 4]) != 1


def test_sort_det_thresh_and_predicted_motion():
    trk = Sort(det_thresh=0.6, min_hits=1, max_age=5)
    out = trk.update(np.array([_box(50, 50)]), np.array([0.55]))
    assert len(out) == 0  # below det_thresh: ignored entirely
    for t in range(6):
        out = trk.update(np.array([_box(50 + 4 * t, 50)]),
                         np.array([0.9]))
    # constant-velocity state has locked onto the motion: the x-velocity of
    # the (cx, cy, s, r) filter should be ~4 px/frame
    assert trk.mean[0, 4] == pytest.approx(4.0, abs=1.0)
    # aspect ratio is held constant by design (7-state SORT filter)
    assert trk.mean.shape[1] == 7


# ---------------------------------------------------------------------------
# DeepSORT
# ---------------------------------------------------------------------------

def _feat(seed, dim=16):
    rng = np.random.RandomState(seed)
    f = rng.randn(dim)
    return f / np.linalg.norm(f)


def test_deepsort_n_init_confirmation():
    trk = DeepSort(n_init=3, min_confidence=0.3)
    fa = _feat(1)
    for t in range(5):
        views = trk.update(np.array([_box(30 + t, 40)]),
                           np.array([0.9]), fa[None])
        # tentative rows emit nothing until the 3rd consecutive hit
        assert (len(views) == 1) == (t >= 2), (t, views)
    assert views[0].track_id == 1


def test_deepsort_appearance_keeps_identity_through_crossing():
    """Two targets swap positions; embeddings are orthogonal, so the
    appearance cascade must carry the identities across the crossing where
    IoU alone is ambiguous."""
    fa, fb = _feat(1), _feat(2)
    trk = DeepSort(n_init=1, min_confidence=0.3, max_dist=0.4)
    id_a = id_b = None
    for t in range(21):
        xa = 20.0 + 3.0 * t   # A moves right
        xb = 80.0 - 3.0 * t   # B moves left; they meet at t=10
        views = trk.update(
            np.array([_box(xa, 50), _box(xb, 50)]),
            np.array([0.9, 0.9]),
            np.stack([fa, fb]))
        by_id = {v.track_id: v for v in views}
        if t == 0:
            id_a, id_b = sorted(by_id)  # A first in det order -> id 1
        if t == 20 and id_a in by_id and id_b in by_id:
            # A ended on the right, B on the left
            assert by_id[id_a].tlbr[0] > by_id[id_b].tlbr[0]
    assert id_a in by_id and id_b in by_id


def test_deepsort_reid_after_occlusion():
    fa = _feat(3)
    trk = DeepSort(n_init=1, max_age=20)
    for t in range(5):
        views = trk.update(np.array([_box(30 + 2 * t, 40)]),
                           np.array([0.9]), fa[None])
    tid = views[0].track_id
    for _ in range(4):  # occluded: no detections
        trk.update(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0, 16)))
    # reappears roughly where the motion model expects it
    views = trk.update(np.array([_box(30 + 2 * 9, 40)]),
                       np.array([0.9]), fa[None])
    assert [v.track_id for v in views] == [tid]


def test_deepsort_tentative_drop_same_frame_as_match():
    """A missed tentative row deleted in the same frame another row matches:
    row indices compact under the matched row, so detection provenance must
    key on the (pre-compaction) track ids, not on stale row indices —
    regression for an IndexError / wrong-mask-provenance bug."""
    fa, fb = _feat(11), _feat(12)
    trk = DeepSort(n_init=3, min_confidence=0.3)
    trk.update(np.array([_box(20, 30), _box(70, 40)]),
               np.array([0.9, 0.9]), np.stack([fa, fb]))
    # only the second target persists; frame 2 drops the missed tentative
    # row 0 while row 1 matches (previously: IndexError in det_of_tid)
    views = None
    for t in range(1, 4):
        views = trk.update(np.array([_box(70 + 2 * t, 40)]),
                           np.array([0.9]), fb[None])
    # survivor confirms on its 3rd hit with its ORIGINAL id and its
    # detection provenance points at the right caller row
    assert [v.track_id for v in views] == [2]
    assert trk.last_det_indices == [0]


def test_deepsort_gallery_budget():
    trk = DeepSort(n_init=1, nn_budget=5)
    fa = _feat(4)
    for t in range(12):
        trk.update(np.array([_box(30, 40)]), np.array([0.9]), fa[None])
    assert len(trk.gallery[0]) == 5


# ---------------------------------------------------------------------------
# MOTDT
# ---------------------------------------------------------------------------

def _motdt_step(trk, det_boxes, det_scores, feat_of_box):
    boxes, scores, from_det = trk.propose(det_boxes, det_scores)
    feats = np.stack([feat_of_box(b) for b in boxes]) if len(boxes) \
        else np.zeros((0, 16))
    return trk.update(boxes, scores, from_det, feats)


def test_motdt_candidate_bridges_missed_detection():
    """With use_tracking, a dropped detection frame is bridged by the
    track's own Kalman-propagated candidate — the identity survives."""
    fa = _feat(5)
    trk = OnlineTracker(min_cls_score=0.3, use_tracking=True)
    feat_of = lambda b: fa
    for t in range(4):
        views = _motdt_step(trk, np.array([_box(30 + 2 * t, 40)]),
                            np.array([0.9]), feat_of)
    tid = views[0].track_id
    # detector blanks for 2 frames: the propagated candidate keeps the row
    # tracked (and output) with the same id
    for t in range(4, 6):
        views = _motdt_step(trk, np.zeros((0, 4)), np.zeros((0,)), feat_of)
        assert [v.track_id for v in views] == [tid]
    views = _motdt_step(trk, np.array([_box(30 + 2 * 6, 40)]),
                        np.array([0.9]), feat_of)
    assert [v.track_id for v in views] == [tid]


def test_motdt_no_tracking_candidates_no_bridge():
    fa = _feat(6)
    trk = OnlineTracker(min_cls_score=0.3, use_tracking=False)
    feat_of = lambda b: fa
    for t in range(4):
        _motdt_step(trk, np.array([_box(30 + 2 * t, 40)]),
                    np.array([0.9]), feat_of)
    views = _motdt_step(trk, np.zeros((0, 4)), np.zeros((0,)), feat_of)
    assert views == []  # no candidate set -> row goes lost, nothing emitted


def test_motdt_new_tracks_only_from_detections():
    """Propagated candidates must never mint new identities."""
    fa = _feat(7)
    trk = OnlineTracker(min_cls_score=0.3, use_tracking=True)
    feat_of = lambda b: fa
    for t in range(3):
        _motdt_step(trk, np.array([_box(30 + 2 * t, 40)]),
                    np.array([0.9]), feat_of)
    n_rows = len(trk.state)
    for _ in range(2):  # only propagated candidates exist in these frames
        _motdt_step(trk, np.zeros((0, 4)), np.zeros((0,)), feat_of)
    assert len(trk.state) == n_rows
    assert trk._next_id == 2  # exactly the one real identity was issued


def test_motdt_activation_delay_and_lost_refind():
    fa, fb = _feat(8), _feat(9)
    trk = OnlineTracker(min_cls_score=0.3, use_tracking=False,
                        max_time_lost=10)
    feats = {30.0: fa, 90.0: fb}
    feat_of = lambda b: feats[round((b[0] + b[2]) / 2 // 30 * 30)]

    views = _motdt_step(trk, np.array([_box(30, 40)]), np.array([0.9]),
                        lambda b: fa)
    assert len(views) == 1  # frame 1 tracks are born activated
    # a target born at frame >= 2 is not emitted until its second match
    views = _motdt_step(trk, np.array([_box(30, 40), _box(90, 40)]),
                        np.array([0.9, 0.9]), feat_of)
    assert [v.track_id for v in views] == [1]
    views = _motdt_step(trk, np.array([_box(30, 40), _box(90, 40)]),
                        np.array([0.9, 0.9]), feat_of)
    assert sorted(v.track_id for v in views) == [1, 2]

    # lose target 2 for a few frames, then re-find it by appearance
    for _ in range(3):
        _motdt_step(trk, np.array([_box(30, 40)]), np.array([0.9]),
                    lambda b: fa)
    views = _motdt_step(trk, np.array([_box(30, 40), _box(90, 40)]),
                        np.array([0.9, 0.9]), feat_of)
    assert sorted(v.track_id for v in views) == [1, 2]


# ---------------------------------------------------------------------------
# MOTEvaluator integration (all three paths)
# ---------------------------------------------------------------------------

def test_mot_evaluator_sort_path(tmp_path):
    from test_mot_evaluator_e2e import FakeMOTDataset

    from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator

    import jax.numpy as jnp

    ds = FakeMOTDataset()
    r = min(ds.img_size[0] / ds.hw[0], ds.img_size[1] / ds.hw[1])
    counter = {"i": 0}

    def step_fn(params, frame):
        boxes = ds.items[counter["i"]][2]
        counter["i"] += 1
        dets = np.zeros((8, 7), np.float32)
        n = len(boxes)
        dets[:n, :4] = boxes * r
        dets[:n, 4] = dets[:n, 5] = 0.95
        valid = np.zeros((8,), bool)
        valid[:n] = True
        return jnp.asarray(dets), jnp.asarray(valid)

    ev = MOTEvaluator(dataset=ds, track_thresh=0.5, min_box_area=1)
    results = ev.evaluate(step_fn, None, result_dir=str(tmp_path),
                          tracker="sort")
    assert set(results) == {"vid0", "vid1"}
    metrics = MOTEvaluator.score(results, ds.gt)
    # SORT emits from frame 1 (frame_count <= min_hits rule) and the motion
    # is linear, so near-perfect tracking is expected
    assert metrics["MOTA"] > 0.9, metrics
    assert metrics["IDsw"] == 0


@pytest.mark.parametrize("tracker", ["deepsort", "motdt"])
def test_mot_evaluator_embedding_paths(tracker, tmp_path):
    from test_mot_evaluator_e2e import FakeMOTDataset

    from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator

    ds = FakeMOTDataset()
    r = min(ds.img_size[0] / ds.hw[0], ds.img_size[1] / ds.hw[1])
    counter = {"i": 0}

    def whole_fn(params, frame):
        boxes = ds.items[counter["i"]][2]
        counter["i"] += 1
        dets = np.zeros((8, 7), np.float32)
        n = len(boxes)
        dets[:n, :4] = boxes * r
        dets[:n, 4] = dets[:n, 5] = 0.95
        valid = np.zeros((8,), bool)
        valid[:n] = True
        return dets, valid, np.zeros((1, 4, 4, 8), np.float32)

    def embed_fn(params, feat_prev, feat_cur, centers):
        # synthetic appearance: a smooth function of the box center, so the
        # same object keeps a similar embedding across frames
        centers = np.asarray(centers, np.float64)
        ang = centers @ np.array([[0.05, 0.21], [0.17, 0.03]])
        return np.concatenate([np.sin(ang), np.cos(ang)], axis=1)

    ev = MOTEvaluator(dataset=ds, track_thresh=0.5, min_box_area=1)
    results = ev.evaluate_omni(whole_fn, embed_fn, None, tracker=tracker)
    assert set(results) == {"vid0", "vid1"}
    metrics = MOTEvaluator.score(results, ds.gt)
    # deepsort withholds tentative tracks for n_init=3 frames (10-frame
    # videos -> recall <= 0.8); identity consistency is the real assertion
    assert metrics["IDsw"] == 0, metrics
    assert metrics["MOTA"] > 0.5, metrics
    assert metrics["IDF1"] > 0.6, metrics


def test_deepsort_carries_class_labels():
    """Multi-class serving (BDD): each track keeps its detection class so
    per-class scoring downstream stays meaningful."""
    trk = DeepSort(n_init=1, min_confidence=0.3)
    fa, fb = _feat(10), _feat(11)
    for t in range(3):
        views = trk.update(
            np.array([_box(30 + t, 40), _box(90 - t, 40)]),
            np.array([0.9, 0.9]),
            np.stack([fa, fb]),
            classes=np.array([2, 7]))
    got = {v.track_id: v.cls for v in views}
    assert sorted(got.values()) == [2, 7]
    # empty frame still steps the table (ages advance toward max_age)
    ages_before = trk.time_since_update.copy()
    trk.update(np.zeros((0, 4)), np.zeros((0,)), np.zeros((0, 16)))
    assert (trk.time_since_update == ages_before + 1).all()
