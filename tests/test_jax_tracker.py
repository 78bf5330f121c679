"""On-device ByteTrack vs host ByteTrack on a synthetic video."""
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.tracker.byte_tracker import ByteTracker
from unicorn_tpu.tracker.jax_tracker import init_state, tracker_step


def run_device_tracker(frames_dets, max_tracks=32, max_dets=16):
    ts = init_state(max_tracks)
    outputs = []
    for dets in frames_dets:
        D = len(dets)
        padded = np.zeros((max_dets, 5), np.float32)
        padded[:D] = dets
        valid = np.zeros((max_dets,), bool)
        valid[:D] = True
        ts, out, out_valid = tracker_step(ts, jnp.asarray(padded),
                                          jnp.asarray(valid))
        out = np.asarray(out)[np.asarray(out_valid)]
        outputs.append(out)
    return outputs


def make_dets(n_frames=25, n_obj=3, seed=0):
    rng = np.random.RandomState(seed)
    pos = rng.uniform(100, 400, (n_obj, 2))
    vel = rng.uniform(-3, 3, (n_obj, 2))
    size = rng.uniform(40, 60, (n_obj, 2))
    frames = []
    for t in range(n_frames):
        b = np.concatenate([pos + t * vel, pos + t * vel + size], 1)
        dets = np.concatenate([b, np.full((n_obj, 1), 0.9)], 1)
        frames.append(dets.astype(np.float32))
    return frames


def test_device_tracker_stable_ids():
    frames = make_dets()
    outs = run_device_tracker(frames)
    # frame 0: all activated (frame_id == 1 special case)
    assert len(outs[0]) == 3
    ids_first = sorted(outs[0][:, 5].tolist())
    for out in outs[1:]:
        assert sorted(out[:, 5].tolist()) == ids_first
        assert len(out) == 3


def test_device_tracker_matches_host_ids():
    frames = make_dets(seed=3)
    outs_dev = run_device_tracker(frames)

    host = ByteTracker(track_thresh=0.6, track_buffer=30, match_thresh=0.9)
    for t, dets in enumerate(frames):
        online = host.update(dets[:, :4], dets[:, 4])
        host_ids = sorted(tr.track_id for tr in online)
        dev_ids = sorted(outs_dev[t][:, 5].astype(int).tolist())
        assert host_ids == dev_ids, f"frame {t}: {host_ids} vs {dev_ids}"


def test_device_tracker_occlusion_recovery():
    """Object disappears for 3 frames, then reappears -> same id (lost->refind)."""
    frames = make_dets(n_frames=20, n_obj=2, seed=1)
    drop = set(range(8, 11))
    seq = []
    for t, dets in enumerate(frames):
        seq.append(dets[1:] if t in drop else dets)
    outs = run_device_tracker(seq)
    ids_before = sorted(outs[7][:, 5].astype(int).tolist())
    assert len(outs[8]) == 1  # one object visible
    ids_after = sorted(outs[12][:, 5].astype(int).tolist())
    assert ids_after == ids_before


def test_device_tracker_new_object_midway():
    frames = make_dets(n_frames=15, n_obj=2, seed=2)
    extra = make_dets(n_frames=15, n_obj=1, seed=5)
    seq = []
    for t in range(15):
        seq.append(frames[t] if t < 6 else
                   np.concatenate([frames[t], extra[t]], 0))
    outs = run_device_tracker(seq)
    assert len(outs[4]) == 2
    # new object becomes activated after its second frame
    assert len(outs[8]) == 3
    ids_old = set(outs[4][:, 5].astype(int))
    ids_now = set(outs[8][:, 5].astype(int))
    assert ids_old < ids_now


def test_device_tracker_crowded_hungarian_agreement():
    """VERDICT r1 item 4: on crowded frames (40-80 overlapping, jittered,
    score-mixed dets) the device auction assignment must agree with the host
    scipy-Hungarian ByteTracker at >= 99% of track-id pairings."""
    from scipy.optimize import linear_sum_assignment

    def crowded_seq(n_obj, n_frames, seed):
        rng = np.random.RandomState(seed)
        pos = rng.uniform(100, 500, (n_obj, 2))
        vel = rng.uniform(-5, 5, (n_obj, 2))
        size = rng.uniform(30, 90, (n_obj, 2))
        frames = []
        for t in range(n_frames):
            p = pos + t * vel
            b = np.concatenate([p, p + size], 1) + rng.randn(n_obj, 4) * 1.5
            s = np.clip(rng.uniform(0.2, 1.0, (n_obj, 1)), 0, 1)
            keep = rng.rand(n_obj) > 0.05  # occasional dropout -> lost tracks
            frames.append(np.concatenate([b, s], 1)[keep].astype(np.float32))
        return frames

    total = agree = 0
    MD, MT = 96, 256
    ts = None
    for seed, n_obj in ((3, 60), (5, 80)):
        frames = crowded_seq(n_obj, 20, seed)
        from unicorn_tpu.tracker.jax_tracker import init_state, tracker_step
        ts = init_state(MT)
        host = ByteTracker()
        mapping = {}
        for dets in frames:
            D = len(dets)
            pad = np.zeros((MD, 5), np.float32); pad[:D] = dets
            val = np.zeros((MD,), bool); val[:D] = True
            ts, out, ov = tracker_step(ts, jnp.asarray(pad), jnp.asarray(val))
            out = np.asarray(out)[np.asarray(ov)]
            hv = host.update(dets[:, :4], dets[:, 4])
            if not len(hv) or not len(out):
                continue
            hb = np.stack([t.tlbr for t in hv])
            hid = [t.track_id for t in hv]
            db, did = out[:, :4], out[:, 5].astype(int)
            tl = np.maximum(hb[:, None, :2], db[None, :, :2])
            br = np.minimum(hb[:, None, 2:], db[None, :, 2:])
            inter = np.prod(np.clip(br - tl, 0, None), -1)
            iou = inter / (np.prod(hb[:, 2:] - hb[:, :2], -1)[:, None]
                           + np.prod(db[:, 2:] - db[:, :2], -1)[None]
                           - inter + 1e-9)
            r, c = linear_sum_assignment(-iou)
            for i, j in zip(r, c):
                if iou[i, j] < 0.7:
                    continue
                total += 1
                h, d = hid[i], did[j]
                if h not in mapping and d not in mapping.values():
                    mapping[h] = d
                agree += mapping.get(h) == d
    assert total > 1000, f"test under-powered: only {total} pairs"
    assert agree / total >= 0.99, f"agreement {agree}/{total}"


def test_greedy_assign_equal_cost_ties_stay_one_to_one():
    """Two rows tied as mutual-best for the same column must not both match
    it (regression: duplicate detection boxes with identical scores made two
    track slots Kalman-update from one detection)."""
    from unicorn_tpu.tracker.jax_tracker import greedy_assign

    ones = jnp.ones((2,), bool)
    # second column over threshold: exactly one row wins col 0
    m = np.asarray(greedy_assign(jnp.asarray([[0.2, 0.9], [0.2, 0.9]]),
                                 ones, ones, 0.5, 16))
    assert sorted(m.tolist()) == [-1, 0], m
    # second column under threshold: the loser falls through to col 1
    m2 = np.asarray(greedy_assign(jnp.asarray([[0.2, 0.3], [0.2, 0.3]]),
                                  ones, ones, 0.5, 16))
    assert sorted(m2.tolist()) == [0, 1], m2
    # fully tied square: a permutation, no column used twice
    m3 = np.asarray(greedy_assign(jnp.asarray([[0.1, 0.1, 0.1]] * 3),
                                  jnp.ones((3,), bool), jnp.ones((3,), bool),
                                  0.5, 16))
    assert sorted(m3.tolist()) == [0, 1, 2], m3


def test_jax_kalman_matches_host():
    """Vectorized jax Kalman == host numpy KalmanFilter."""
    from unicorn_tpu.tracker.jax_tracker import (
        kalman_initiate, kalman_predict, kalman_update,
    )
    from unicorn_tpu.tracker.kalman import KalmanFilter

    kf = KalmanFilter()
    meas = np.array([120.0, 80.0, 0.5, 60.0])
    m_h, c_h = kf.initiate(meas)
    m_j, c_j = kalman_initiate(jnp.asarray(meas))
    np.testing.assert_allclose(np.asarray(m_j), m_h, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_h, rtol=1e-6)

    m_h, c_h = kf.predict(m_h, c_h)
    m_j, c_j = kalman_predict(m_j, c_j)
    np.testing.assert_allclose(np.asarray(m_j), m_h, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_h, rtol=1e-6)

    z = np.array([124.0, 83.0, 0.52, 61.0])
    m_h, c_h = kf.update(m_h, c_h, z)
    m_j, c_j = kalman_update(m_j, c_j, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(m_j), m_h, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_j), c_h, rtol=1e-4, atol=1e-7)
