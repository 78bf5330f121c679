"""On-device ByteTrack: the association step as a pure jax function over
fixed track slots.

TPU-native replacement for the host tracker (tracker/byte_tracker.py): the
whole tracker state (Kalman means/covs, slot table) lives in HBM as a pytree
carry; one `tracker_step` call consumes one frame's (max_dets, 5) padded
detections. No host round-trip per frame — the streaming driver fetches
emitted track outputs in periodic batches (SURVEY.md §7 "inference driver").

Association uses a parallel auction (auction_assign) — the same
cost-limit-optimal objective as the reference's lapjv — so device/host ID
agreement holds even on crowded frames; two-stage BYTE logic (high/low split,
unconfirmed handling, lost buffer) matches byte_tracker.py:161-296.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# slot states
S_EMPTY, S_TRACKED, S_LOST = 0, 1, 2


class TrackState(NamedTuple):
    mean: jnp.ndarray        # (T, 8) cx, cy, a, h + velocities
    cov: jnp.ndarray         # (T, 8, 8)
    state: jnp.ndarray       # (T,) int: 0 empty / 1 tracked / 2 lost
    activated: jnp.ndarray   # (T,) bool
    track_id: jnp.ndarray    # (T,) int32
    score: jnp.ndarray       # (T,)
    last_frame: jnp.ndarray  # (T,) int32 — frame of last update
    start_frame: jnp.ndarray  # (T,) int32
    next_id: jnp.ndarray     # () int32
    frame_id: jnp.ndarray    # () int32


def init_state(max_tracks: int = 128) -> TrackState:
    T = max_tracks
    return TrackState(
        mean=jnp.zeros((T, 8)), cov=jnp.zeros((T, 8, 8)),
        state=jnp.zeros((T,), jnp.int32), activated=jnp.zeros((T,), bool),
        track_id=jnp.zeros((T,), jnp.int32), score=jnp.zeros((T,)),
        last_frame=jnp.zeros((T,), jnp.int32),
        start_frame=jnp.zeros((T,), jnp.int32),
        next_id=jnp.ones((), jnp.int32), frame_id=jnp.zeros((), jnp.int32),
    )


# ---------------- Kalman (vectorized; tracker/kalman.py parity) -------------

_STD_POS = 1.0 / 20
_STD_VEL = 1.0 / 160


def _motion_mat():
    m = jnp.eye(8)
    return m.at[jnp.arange(4), jnp.arange(4) + 4].set(1.0)


def kalman_initiate(meas):
    """meas (4,) cxcyah -> (mean (8,), cov (8, 8))."""
    h = meas[3]
    mean = jnp.concatenate([meas, jnp.zeros(4)])
    std = jnp.stack([
        2 * _STD_POS * h, 2 * _STD_POS * h, 1e-2, 2 * _STD_POS * h,
        10 * _STD_VEL * h, 10 * _STD_VEL * h, 1e-5, 10 * _STD_VEL * h,
    ])
    return mean, jnp.diag(std ** 2)


def kalman_predict(mean, cov):
    h = mean[3]
    std = jnp.stack([_STD_POS * h, _STD_POS * h, 1e-2, _STD_POS * h,
                     _STD_VEL * h, _STD_VEL * h, 1e-5, _STD_VEL * h])
    F = _motion_mat()
    return F @ mean, F @ cov @ F.T + jnp.diag(std ** 2)


def kalman_update(mean, cov, meas):
    h = mean[3]
    std = jnp.stack([_STD_POS * h, _STD_POS * h, 1e-1, _STD_POS * h])
    Hm = jnp.eye(4, 8)
    S = Hm @ cov @ Hm.T + jnp.diag(std ** 2)
    K = jnp.linalg.solve(S, Hm @ cov).T  # (8, 4)
    innov = meas - Hm @ mean
    return mean + K @ innov, cov - K @ S @ K.T


def mean_to_tlbr(mean):
    """(…, 8) cxcyah -> (…, 4) tlbr."""
    cx, cy, a, h = mean[..., 0], mean[..., 1], mean[..., 2], mean[..., 3]
    w = a * h
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def xyxy_to_xyah(b):
    w = b[..., 2] - b[..., 0]
    h = b[..., 3] - b[..., 1]
    return jnp.stack([
        (b[..., 0] + b[..., 2]) / 2, (b[..., 1] + b[..., 3]) / 2,
        w / jnp.maximum(h, 1e-6), h,
    ], -1)


# ---------------- assignment kernels ----------------------------------------

def auction_assign(cost, row_valid, col_valid, thresh,
                   eps: float = 2e-4, max_iter: int = 20000):
    """Optimal assignment with cost-limit via parallel (Jacobi) auction.

    Maximizes sum(thresh - cost) over the matching — the same objective as
    lapjv(extend_cost=True, cost_limit=thresh) / the host Hungarian
    (matching.linear_assignment): a pair is worth matching iff cost < thresh.
    All unassigned rows bid simultaneously each round (two (R,C) reductions),
    so rounds are parallel-friendly; the while_loop exits as soon as no row
    can still improve, which on real association matrices (sparse IoU
    structure) is a few tens of rounds. The result is within n*eps of optimal.
    eps trades bidding-war length (rounds ~ tie-gap/eps) against resolution;
    2e-4 reproduces scipy-Hungarian matchings exactly on IoU-shaped tracking
    costs (tests/test_jax_tracker.py crowded property test; eps=1e-3 was
    still exact on 120 random crowded frames). Returns match_col (R,) int32
    (-1 = unmatched).
    """
    NEG = -1e9
    R, C = cost.shape
    benefit = jnp.where(row_valid[:, None] & col_valid[None, :],
                        thresh - cost, NEG)

    def cond(state):
        it, price, owner = state
        value = benefit - price[None, :]
        match = _owner_to_match(owner, R)
        want = (match < 0) & row_valid & (jnp.max(value, axis=1) > 0)
        return (it < max_iter) & jnp.any(want)

    def body(state):
        it, price, owner = state
        value = benefit - price[None, :]                    # (R, C)
        match = _owner_to_match(owner, R)
        j1 = jnp.argmax(value, axis=1)                      # best column
        v1 = jnp.take_along_axis(value, j1[:, None], 1)[:, 0]
        # second-best alternative includes "stay unassigned" (value 0) — the
        # cost-limit dummy; without it a row overbids past the point where
        # its assignment is worth having at all.
        v2 = jnp.maximum(
            jnp.max(value.at[jnp.arange(R), j1].set(NEG), axis=1), 0.0)
        bidder = (match < 0) & row_valid & (v1 > 0)
        bid = price[j1] + (v1 - v2) + eps
        # per-column best bid ((R,C) one-hot keeps it reduction-shaped)
        bidmat = jnp.where(
            bidder[:, None] & (j1[:, None] == jnp.arange(C)[None, :]),
            bid[:, None], NEG)
        col_best = jnp.max(bidmat, axis=0)                  # (C,)
        winner = jnp.argmax(bidmat, axis=0).astype(jnp.int32)
        has_bid = col_best > NEG / 2
        price = jnp.where(has_bid, col_best, price)
        owner = jnp.where(has_bid, winner, owner)           # loser is evicted
        return it + 1, price, owner

    owner0 = jnp.full((C,), -1, jnp.int32)
    _, _, owner = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((C,)), owner0))
    return _owner_to_match(owner, R)


def _owner_to_match(owner, n_rows):
    """owner (C,) row-per-column -> match (R,) column-per-row."""
    C = owner.shape[0]
    m = jnp.full((n_rows + 1,), -1, jnp.int32)
    m = m.at[jnp.where(owner >= 0, owner, n_rows)].set(
        jnp.arange(C, dtype=jnp.int32))
    return m[:n_rows]



def greedy_assign(cost, row_valid, col_valid, thresh, n_iter: int):
    """Global-min greedy assignment via parallel mutual-best elimination.

    Equivalent to repeatedly taking the global minimum (for distinct costs):
    every (row, col) pair that is both its row's and its column's minimum is
    matched simultaneously each round — a round is a handful of parallel
    reductions instead of one sequential argmin per match, so rounds ~ O(chain
    depth) (typically <= 5) replace n sequential steps.

    cost (R, C); returns match_col (R,) int (-1 = unmatched).
    """
    BIG = 1e9
    R, C = cost.shape
    cost = jnp.where(row_valid[:, None] & col_valid[None, :], cost, BIG)
    n_rounds = min(16, n_iter)

    def body(_, carry):
        cost, match = carry
        row_min = jnp.min(cost, axis=1, keepdims=True)     # (R, 1)
        col_min = jnp.min(cost, axis=0, keepdims=True)     # (1, C)
        mutual = (cost <= row_min) & (cost <= col_min) & (cost < thresh)
        # break ties inside a row: keep the first mutual col
        first_c = jnp.argmax(mutual, axis=1)
        row_has = jnp.any(mutual, axis=1) & (match < 0)
        # break ties ACROSS rows: with equal costs two rows can both be
        # mutual-best for the same column — only the first claiming row
        # wins it this round (the loser re-contends on later rounds)
        claims = row_has[:, None] & (jnp.arange(C)[None, :] == first_c[:, None])
        winner = jnp.argmax(claims, axis=0)                # (C,) first row
        won = row_has & (winner[first_c] == jnp.arange(R))
        match = jnp.where(won, first_c.astype(jnp.int32), match)
        # eliminate matched rows/cols
        col_taken = jnp.zeros((C,), bool).at[first_c].max(won)
        cost = jnp.where(won[:, None] | col_taken[None, :], BIG, cost)
        return cost, match

    _, match = jax.lax.fori_loop(
        0, n_rounds, body, (cost, jnp.full((R,), -1, jnp.int32)))
    return match


def iou_xyxy(a, b, inclusive: bool = False):
    """(Ra, 4) x (Rb, 4) -> (Ra, Rb).

    inclusive=True uses the +1 inclusive-pixel convention of
    cython_bbox.bbox_overlaps (the reference's association IoU), matching the
    host tracker's matching.inclusive_iou_np.
    """
    off = 1.0 if inclusive else 0.0
    tl = jnp.maximum(a[:, None, :2], b[None, :, :2])
    br = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.clip(br - tl + off, 0, None), -1)
    area_a = jnp.prod(jnp.clip(a[:, 2:] - a[:, :2] + off, 0, None), -1)
    area_b = jnp.prod(jnp.clip(b[:, 2:] - b[:, :2] + off, 0, None), -1)
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-9)


def _assign_fn():
    """Production assignment = auction (Hungarian-exact on tracking costs).
    UNICORN_ASSIGN=greedy swaps in the mutual-best kernel for perf A/Bs."""
    import os

    if os.environ.get("UNICORN_ASSIGN") == "greedy":
        return lambda c, rv, cv, th: greedy_assign(c, rv, cv, th, 16)
    return auction_assign


# ---------------- the per-frame step ----------------------------------------

@partial(jax.jit, static_argnames=("track_thresh", "match_thresh",
                                   "max_time_lost", "det_thresh_offset"))
def tracker_step(ts: TrackState, dets, det_valid,
                 track_thresh: float = 0.6, match_thresh: float = 0.9,
                 max_time_lost: int = 30, det_thresh_offset: float = 0.1):
    """One BYTE association step.

    dets: (D, 5) [x1, y1, x2, y2, score] padded; det_valid: (D,) bool.
    Returns (new_state, out (T, 6) [x1,y1,x2,y2,score,track_id] for currently
    activated tracked slots, out_valid (T,)).
    """
    T = ts.mean.shape[0]
    D = dets.shape[0]
    frame_id = ts.frame_id + 1
    det_thresh = track_thresh + det_thresh_offset

    # Kalman predict for all live slots (lost slots zero their h-velocity,
    # byte_tracker.py STrack.multi_predict)
    mean_in = jnp.where((ts.state == S_LOST)[:, None],
                        ts.mean.at[:, 7].set(0.0), ts.mean)
    mean_p, cov_p = jax.vmap(kalman_predict)(mean_in, ts.cov)
    live = ts.state != S_EMPTY
    # only the tracked+lost pool is predicted; unconfirmed slots keep their
    # initiate-time mean/cov (reference predicts strack_pool only — an
    # unconfirmed track matched in stage 3 must update from the *un-inflated*
    # covariance or its posterior drifts from the host tracker's)
    pool_pred = live & (ts.activated | (ts.state == S_LOST))
    mean_p = jnp.where(pool_pred[:, None], mean_p, ts.mean)
    cov_p = jnp.where(pool_pred[:, None, None], cov_p, ts.cov)

    scores = dets[:, 4]
    high = det_valid & (scores > track_thresh)
    low = det_valid & (scores > 0.1) & (scores < track_thresh)

    track_boxes = mean_to_tlbr(mean_p)

    # --- association 1: activated-or-lost slots vs high dets, fused score ---
    _assign = _assign_fn()
    pool1 = live & (ts.activated | (ts.state == S_LOST))
    iou1 = iou_xyxy(track_boxes, dets[:, :4], inclusive=True)
    cost1 = 1.0 - iou1 * scores[None, :]  # fuse_score (matching.py fuse_score)
    match1 = _assign(cost1, pool1, high, match_thresh)

    # --- association 2: remaining TRACKED slots vs low dets, plain IoU ------
    pool2 = live & (ts.state == S_TRACKED) & ts.activated & (match1 < 0)
    cost2 = 1.0 - iou1
    match2 = _assign(cost2, pool2, low, 0.5)

    # --- association 3: unconfirmed (tracked, not activated) vs leftover ---
    det_used = jnp.zeros((D,), bool)
    det_used = det_used.at[jnp.where(match1 >= 0, match1, 0)].max(match1 >= 0)
    pool3 = live & (ts.state == S_TRACKED) & (~ts.activated)
    cost3 = 1.0 - iou1 * scores[None, :]
    match3 = _assign(cost3, pool3, high & (~det_used), 0.7)

    match = jnp.where(match1 >= 0, match1,
                      jnp.where(match2 >= 0, match2, match3))
    matched = match >= 0
    det_idx = jnp.where(matched, match, 0)
    meas = xyxy_to_xyah(dets[det_idx, :4])

    mean_u, cov_u = jax.vmap(kalman_update)(mean_p, cov_p, meas)
    new_mean = jnp.where(matched[:, None], mean_u, mean_p)
    new_cov = jnp.where(matched[:, None, None], cov_u, cov_p)
    new_score = jnp.where(matched, dets[det_idx, 4], ts.score)
    new_activated = ts.activated | matched
    new_last = jnp.where(matched, frame_id, ts.last_frame)
    new_state_v = jnp.where(matched, S_TRACKED, ts.state)

    # unmatched tracked -> lost; unconfirmed unmatched -> removed (empty)
    unmatched_tracked = live & (ts.state == S_TRACKED) & ts.activated & ~matched
    new_state_v = jnp.where(unmatched_tracked, S_LOST, new_state_v)
    unconfirmed_unmatched = live & (ts.state == S_TRACKED) & (~ts.activated) & ~matched
    new_state_v = jnp.where(unconfirmed_unmatched, S_EMPTY, new_state_v)
    # expire lost
    expired = (new_state_v == S_LOST) & (frame_id - new_last > max_time_lost)
    new_state_v = jnp.where(expired, S_EMPTY, new_state_v)

    # --- new tracks from unmatched strong dets ------------------------------
    det_used = det_used.at[jnp.where(match2 >= 0, match2, 0)].max(match2 >= 0)
    det_used = det_used.at[jnp.where(match3 >= 0, match3, 0)].max(match3 >= 0)
    # >= matches the host tracker (byte_tracker.py `>= det_thresh`; the
    # reference drops only `score < det_thresh`) — a det at exactly the
    # threshold must start a track on both paths or ids diverge forever
    new_det = det_valid & (scores >= det_thresh) & high & (~det_used)
    # assign det j -> the j-th free slot (computed via cumulative counts)
    free = new_state_v == S_EMPTY
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1      # rank among slots
    det_rank = jnp.cumsum(new_det.astype(jnp.int32)) - 1    # rank among dets
    # slot_for_rank[r] = index of r-th free slot
    slot_for_rank = jnp.full((T + D,), -1, jnp.int32)
    slot_idx = jnp.where(free, free_rank, T + D - 1)
    slot_for_rank = slot_for_rank.at[slot_idx].set(jnp.arange(T, dtype=jnp.int32))
    target_slot = slot_for_rank[jnp.clip(det_rank, 0, T + D - 1)]
    place = new_det & (target_slot >= 0)

    init_mean, init_cov = jax.vmap(kalman_initiate)(xyxy_to_xyah(dets[:, :4]))

    def scatter(dst, src, idx, mask):
        idx_safe = jnp.where(mask, idx, T)  # T = scratch row
        pad = jnp.zeros((T + 1,) + dst.shape[1:], dst.dtype).at[:T].set(dst)
        pad = pad.at[idx_safe].set(jnp.where(
            mask.reshape((-1,) + (1,) * (src.ndim - 1)), src,
            pad[idx_safe]))
        return pad[:T]

    new_mean = scatter(new_mean, init_mean, target_slot, place)
    new_cov = scatter(new_cov, init_cov, target_slot, place)
    new_score = scatter(new_score, scores, target_slot, place)
    new_state_v = scatter(new_state_v, jnp.full((D,), S_TRACKED, jnp.int32),
                          target_slot, place)
    new_activated = scatter(new_activated, jnp.broadcast_to(frame_id == 1, (D,)),
                            target_slot, place)
    new_last = scatter(new_last, jnp.full((D,), frame_id, jnp.int32),
                       target_slot, place)
    start = scatter(ts.start_frame, jnp.full((D,), frame_id, jnp.int32),
                    target_slot, place)
    n_new = jnp.sum(place.astype(jnp.int32))
    new_ids = ts.next_id + det_rank.astype(jnp.int32)
    track_id = scatter(ts.track_id, new_ids, target_slot, place)

    # --- de-duplicate tracked vs lost (byte_tracker remove_duplicate) -------
    # overlapping (tracked, lost) slot pairs (IoU > 0.85): the younger of the
    # pair is dropped, per-pair, matching the host _remove_duplicates marks.
    boxes_now = mean_to_tlbr(new_mean)
    is_t = new_state_v == S_TRACKED
    is_l = new_state_v == S_LOST
    dup_iou = iou_xyxy(boxes_now, boxes_now, inclusive=True)
    dup = (dup_iou > 0.85) & is_t[:, None] & is_l[None, :]
    age = (new_last - start).astype(jnp.int32)
    drop_t = jnp.any(dup & (age[:, None] <= age[None, :]), axis=1)
    drop_l = jnp.any(dup & (age[:, None] > age[None, :]), axis=0)
    new_state_v = jnp.where(drop_t | drop_l, S_EMPTY, new_state_v)

    new_ts = TrackState(
        mean=new_mean, cov=new_cov, state=new_state_v,
        activated=new_activated, track_id=track_id, score=new_score,
        last_frame=new_last, start_frame=start,
        next_id=ts.next_id + n_new, frame_id=frame_id,
    )

    out_valid = (new_ts.state == S_TRACKED) & new_ts.activated
    out_boxes = mean_to_tlbr(new_ts.mean)
    out = jnp.concatenate([
        out_boxes, new_ts.score[:, None],
        new_ts.track_id[:, None].astype(out_boxes.dtype),
    ], axis=1)
    return new_ts, out, out_valid
