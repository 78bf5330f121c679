"""Tracker + metrics tests: synthetic video with moving boxes must be tracked
with stable IDs and near-perfect MOTA."""
import numpy as np

from unicorn_tpu.tracker.byte_tracker import ByteTracker
from unicorn_tpu.tracker.qd_tracker import QuasiDenseEmbedTracker
from unicorn_tpu.tracker.matching import linear_assignment
from unicorn_tpu.evaluators.mot_metrics import MOTAccumulator


def make_synthetic_video(n_frames=30, n_obj=4, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(100, 400, (n_obj, 2))
    vel = rng.uniform(-4, 4, (n_obj, 2))
    sizes = rng.uniform(40, 70, (n_obj, 2))
    frames = []
    for t in range(n_frames):
        boxes = np.concatenate([pos + t * vel, pos + t * vel + sizes], 1)
        frames.append(boxes.copy())
    return frames


def test_linear_assignment_cost_limit():
    cost = np.array([[0.2, 0.9], [0.8, 0.1]])
    m, ua, ub = linear_assignment(cost, thresh=0.5)
    assert sorted(map(tuple, m.tolist())) == [(0, 0), (1, 1)]
    # with a tight limit nothing matches
    m2, ua2, ub2 = linear_assignment(cost, thresh=0.05)
    assert len(m2) == 0 and len(ua2) == 2 and len(ub2) == 2


def test_linear_assignment_accepts_cost_between_half_and_full_thresh():
    """lapjv(cost_limit=t) accepts any pair with cost < t — including costs in
    (t/2, t), which a naive all-t/2 dummy padding rejects."""
    m, ua, ub = linear_assignment(np.array([[0.7]]), thresh=0.9)
    assert m.tolist() == [[0, 0]] and not ua and not ub
    # exactly at the limit -> rejected (lapjv is strict)
    m2, ua2, ub2 = linear_assignment(np.array([[0.9]]), thresh=0.9)
    assert len(m2) == 0 and ua2 == (0,) and ub2 == (0,)
    # mixed: one pair above limit, one below
    cost = np.array([[0.85, 2.0], [2.0, 0.95]])
    m3, ua3, ub3 = linear_assignment(cost, thresh=0.9)
    assert m3.tolist() == [[0, 0]] and ua3 == (1,) and ub3 == (1,)


def test_kalman_multi_update_matches_sequential():
    from unicorn_tpu.tracker.kalman import KalmanFilter
    kf = KalmanFilter()
    rng = np.random.RandomState(0)
    means, covs, meas = [], [], []
    for i in range(5):
        m, c = kf.initiate(np.array([100 + 30 * i, 80.0, 0.5, 60 + i]))
        m, c = kf.predict(m, c)
        means.append(m); covs.append(c)
        meas.append(m[:4] + rng.randn(4) * [2, 2, 0.01, 2])
    means, covs, meas = map(np.stack, (means, covs, meas))
    bm, bc = kf.multi_update(means, covs, meas)
    for i in range(5):
        sm, sc = kf.update(means[i], covs[i], meas[i])
        np.testing.assert_allclose(bm[i], sm, rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(bc[i], sc, rtol=1e-6, atol=1e-10)


def test_bytetrack_stable_ids():
    frames = make_synthetic_video()
    tracker = ByteTracker(track_thresh=0.6, track_buffer=30, match_thresh=0.9)
    ids_per_frame = []
    for boxes in frames:
        scores = np.full(len(boxes), 0.9)
        online = tracker.update(boxes, scores)
        ids_per_frame.append(sorted(t.track_id for t in online))
    # after the first frame, ids should be stable
    assert ids_per_frame[1] == ids_per_frame[-1]
    assert len(ids_per_frame[-1]) == 4


def test_bytetrack_low_score_rescue():
    frames = make_synthetic_video(n_frames=10, n_obj=2, seed=1)
    tracker = ByteTracker(track_thresh=0.6)
    ids = None
    for t, boxes in enumerate(frames):
        scores = np.full(len(boxes), 0.9)
        if t == 5:
            scores[0] = 0.3  # drops below track_thresh -> rescued by pass 2
        online = tracker.update(boxes, scores)
        cur = sorted(tr.track_id for tr in online)
        if t == 1:
            ids = cur
        if t >= 1:
            assert cur == ids, f"frame {t}: {cur} != {ids}"


def test_qdtracker_embedding_matching():
    tracker = QuasiDenseEmbedTracker(init_score_thr=0.7, obj_score_thr=0.3,
                                     match_score_thr=0.5)
    rng = np.random.RandomState(0)
    emb = rng.randn(3, 64).astype(np.float32) * 5
    boxes0 = np.array([[10, 10, 50, 50, 0.9], [100, 100, 150, 160, 0.95],
                       [200, 50, 260, 120, 0.85]], np.float32)
    labels = np.zeros(3, int)
    _, _, ids0 = tracker.match(boxes0, labels, emb, 0)
    assert (np.sort(ids0) == np.arange(3)).all()
    # returned rows are sorted by score; map original det -> assigned id
    order0 = np.argsort(-boxes0[:, 4], kind="stable")
    orig_to_id = {int(order0[k]): int(ids0[k]) for k in range(3)}
    # shuffled order, shifted boxes, same embeddings -> ids must follow
    perm = [2, 0, 1]
    boxes1 = boxes0[perm] + 5.0
    _, _, ids1 = tracker.match(boxes1, labels[perm], emb[perm], 1)
    order1 = np.argsort(-boxes1[:, 4], kind="stable")
    expect = [orig_to_id[perm[int(i)]] for i in order1]
    np.testing.assert_array_equal(ids1, expect)


def test_mot_accumulator_stale_carryforward_cannot_double_claim():
    """Two gt ids whose carried-forward last_match point at the SAME hyp id
    must not both claim it in the persistence pass (regression: one hyp
    double-counted as two matches, FP went negative, MOTA > 1)."""
    A = [0.0, 0.0, 10.0, 10.0]
    B = [0.0, 2.0, 10.0, 12.0]   # IoU(A, B) = 8/12 > 0.5
    H = [0.0, 1.0, 10.0, 11.0]   # overlaps both A and B above threshold
    acc = MOTAccumulator()
    acc.update([1], [A], [7], [H])            # frame 1: A <-> h7
    acc.update([2], [B], [7], [H])            # frame 2: B <-> h7 (A absent)
    acc.update([1, 2], [A, B], [7], [H])      # frame 3: both want h7
    m = acc.metrics()
    assert acc.num_fp == 0 and acc.num_fn == 1, (acc.num_fp, acc.num_fn)
    assert acc.num_matches == 3
    assert m["MOTA"] <= 1.0


def test_mot_accumulator_ignore_absorption_respects_persistence():
    """hyp_ignore absorption must be judged by the accumulator's OWN
    matching: a persisted correspondence keeps its hyp matched, so a
    higher-IoU newcomer is the unmatched one — absorbed if flagged, an FP
    if not (regression: a fresh pre-pass Hungarian stole the match and
    manufactured an ID switch)."""
    G = [0.0, 0.0, 10.0, 10.0]
    Hp = [0.0, 3.0, 10.0, 13.0]   # IoU with G = 7/13 ~ 0.54 (persisted)
    for flag_new, want_fp in ((True, 0), (False, 1)):
        acc = MOTAccumulator()
        for _ in range(3):
            acc.update([1], [G], [7], [Hp])
        # newcomer h8 = exact G (IoU 1.0 beats Hp's 0.54)
        acc.update([1], [G], [7, 8], [Hp, G],
                   hyp_ignore=np.array([False, flag_new]))
        assert acc.num_idsw == 0, (flag_new, acc.num_idsw)
        assert acc.num_fp == want_fp, (flag_new, acc.num_fp)
        assert acc.last_match[1] == 7


def test_mot_accumulator_perfect_and_idsw():
    acc = MOTAccumulator()
    frames = make_synthetic_video(n_frames=10, n_obj=3)
    for boxes in frames:
        ids = [1, 2, 3]
        acc.update(ids, boxes, ids, boxes)
    m = acc.metrics()
    assert m["MOTA"] == 1.0 and m["IDF1"] == 1.0 and m["IDsw"] == 0

    acc2 = MOTAccumulator()
    for t, boxes in enumerate(frames):
        gt_ids = [1, 2, 3]
        hyp_ids = [1, 2, 3] if t < 5 else [1, 2, 9]  # one id switch at t=5
        acc2.update(gt_ids, boxes, hyp_ids, boxes)
    m2 = acc2.metrics()
    assert m2["IDsw"] == 1
    assert abs(m2["MOTA"] - (1.0 - 1 / 30)) < 1e-6


def test_byte_tracker_carries_detection_classes():
    """Round-5 regression: update() accepted `classes` but discarded it —
    every TrackView reported cls=0. Classes must ride the track table
    through new-track birth and matched updates."""
    from unicorn_tpu.tracker.byte_tracker import ByteTracker

    trk = ByteTracker(track_thresh=0.5)
    boxes = np.array([[10, 10, 30, 30], [60, 60, 90, 90]], float)
    views = trk.update(boxes, np.array([0.9, 0.9]), classes=np.array([2, 5]))
    assert sorted(v.cls for v in views) == [2, 5]
    # matched update keeps per-track class aligned after motion
    views = trk.update(boxes + 2.0, np.array([0.9, 0.9]),
                       classes=np.array([2, 5]))
    by_id = {v.track_id: v.cls for v in views}
    assert sorted(by_id.values()) == [2, 5]
