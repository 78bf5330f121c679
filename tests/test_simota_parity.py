"""SimOTA assignment parity: our static-shape jax version vs a torch oracle
that follows the reference algorithm step by step (unicorn_head.py:690-919):
candidate gating, factorless BCE cost on the candidate subset, dynamic-k from
top-10 IoU sums, per-gt top-k selection, min-cost conflict resolution."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from unicorn_tpu.losses.det import simota_assign
from unicorn_tpu.models.heads import level_grids


def torch_simota(gt_boxes, gt_classes, pred_boxes, obj_logits, cls_logits,
                 xs, ys, ss, img_size):
    """Oracle on the reference's algorithm (not vectorized)."""
    num_gt = len(gt_boxes)
    A = pred_boxes.shape[0]
    gt = torch.from_numpy(gt_boxes)
    pb = torch.from_numpy(pred_boxes)
    xs_t, ys_t, ss_t = map(torch.from_numpy, (xs, ys, ss))

    xc = (xs_t + 0.5) * ss_t
    yc = (ys_t + 0.5) * ss_t
    gl = gt[:, 0] - 0.5 * gt[:, 2]
    gr = gt[:, 0] + 0.5 * gt[:, 2]
    gtt = gt[:, 1] - 0.5 * gt[:, 3]
    gb = gt[:, 1] + 0.5 * gt[:, 3]
    in_boxes = ((xc[None] > gl[:, None]) & (xc[None] < gr[:, None])
                & (yc[None] > gtt[:, None]) & (yc[None] < gb[:, None]))
    r = 2.5
    cx = gt[:, 0].clamp(0, img_size[1])
    cy = gt[:, 1].clamp(0, img_size[0])
    in_centers = ((xc[None] > cx[:, None] - r * ss_t[None])
                  & (xc[None] < cx[:, None] + r * ss_t[None])
                  & (yc[None] > cy[:, None] - r * ss_t[None])
                  & (yc[None] < cy[:, None] + r * ss_t[None]))
    fg_mask = (in_boxes | in_centers).any(0)
    is_in_boxes_and_center = in_boxes[:, fg_mask] & in_centers[:, fg_mask]

    cand = pb[fg_mask]
    # pairwise iou cxcywh
    tl = torch.max(gt[:, None, :2] - gt[:, None, 2:] / 2,
                   cand[None, :, :2] - cand[None, :, 2:] / 2)
    br = torch.min(gt[:, None, :2] + gt[:, None, 2:] / 2,
                   cand[None, :, :2] + cand[None, :, 2:] / 2)
    en = (tl < br).all(2).float()
    inter = ((br - tl).prod(2) * en)
    iou = inter / (gt[:, 2:].prod(1)[:, None] + cand[:, 2:].prod(1)[None]
                   - inter + 1e-16)

    cls_sig = torch.sigmoid(torch.from_numpy(cls_logits[fg_mask.numpy()]))
    obj_sig = torch.sigmoid(torch.from_numpy(obj_logits[fg_mask.numpy()]))
    p = (cls_sig * obj_sig).sqrt()
    onehot = F.one_hot(torch.from_numpy(gt_classes).long(),
                       cls_logits.shape[1]).float()
    pair_cls = F.binary_cross_entropy(
        p.unsqueeze(0).expand(num_gt, -1, -1),
        onehot[:, None, :].expand(-1, p.shape[0], -1), reduction="none"
    ).sum(-1)
    cost = pair_cls + 3.0 * (-(iou + 1e-8).log()) \
        + 100000.0 * (~is_in_boxes_and_center)

    matching = torch.zeros_like(cost)
    n_candidate_k = min(10, iou.size(1))
    topk_ious, _ = torch.topk(iou, n_candidate_k, dim=1)
    dynamic_ks = torch.clamp(topk_ious.sum(1).int(), min=1)
    for g in range(num_gt):
        _, pos = torch.topk(cost[g], k=int(dynamic_ks[g]), largest=False)
        matching[g][pos] = 1.0
    deg = matching.sum(0)
    if (deg > 1).any():
        _, argmin = torch.min(cost[:, deg > 1], dim=0)
        matching[:, deg > 1] = 0.0
        matching[argmin, deg > 1] = 1.0
    fg_in = matching.sum(0) > 0
    full_fg = torch.zeros(A, dtype=torch.bool)
    idx = torch.nonzero(fg_mask).squeeze(1)
    full_fg[idx[fg_in]] = True
    matched = matching[:, fg_in].argmax(0)
    pred_iou = (matching * iou).sum(0)[fg_in]
    out_match = np.full(A, -1)
    out_iou = np.zeros(A)
    out_match[idx[fg_in].numpy()] = matched.numpy()
    out_iou[idx[fg_in].numpy()] = pred_iou.numpy()
    return full_fg.numpy(), out_match, out_iou


def test_simota_matches_torch_oracle():
    H = W = 96
    hw = [(H // s, W // s) for s in (8, 16, 32)]
    xs, ys, ss = (np.asarray(a) for a in level_grids(hw, (8, 16, 32)))
    A = len(xs)
    M, C = 8, 5
    n_mismatch = 0
    for seed in range(5):
        rng = np.random.RandomState(seed)
        n_gt = rng.randint(1, 5)
        gt_boxes = np.zeros((M, 4), np.float32)
        gt_classes = np.zeros((M,), np.int64)
        for g in range(n_gt):
            w = rng.uniform(12, 50)
            h = rng.uniform(12, 50)
            gt_boxes[g] = [rng.uniform(10, 86), rng.uniform(10, 86), w, h]
            gt_classes[g] = rng.randint(0, C)
        gt_valid = np.arange(M) < n_gt
        pred_boxes = np.stack([
            (xs + 0.5) * ss + rng.randn(A) * 3,
            (ys + 0.5) * ss + rng.randn(A) * 3,
            np.exp(rng.randn(A) * 0.4) * ss,
            np.exp(rng.randn(A) * 0.4) * ss,
        ], 1).astype(np.float32)
        obj_logits = rng.randn(A, 1).astype(np.float32)
        cls_logits = rng.randn(A, C).astype(np.float32)

        res = simota_assign(
            jnp.asarray(gt_boxes), jnp.asarray(gt_classes.astype(np.int32)),
            jnp.asarray(gt_valid), jnp.asarray(pred_boxes),
            jnp.asarray(obj_logits), jnp.asarray(cls_logits),
            jnp.asarray(xs.astype(np.float32)), jnp.asarray(ys.astype(np.float32)),
            jnp.asarray(ss.astype(np.float32)), (H, W),
        )
        ref_fg, ref_match, ref_iou = torch_simota(
            gt_boxes[:n_gt], gt_classes[:n_gt], pred_boxes, obj_logits,
            cls_logits, xs.astype(np.float32), ys.astype(np.float32),
            ss.astype(np.float32), (H, W))

        ours_fg = np.asarray(res.fg_mask)
        np.testing.assert_array_equal(ours_fg, ref_fg,
                                      err_msg=f"fg mismatch seed {seed}")
        ours_match = np.asarray(res.matched_gt)[ours_fg]
        np.testing.assert_array_equal(ours_match, ref_match[ref_fg])
        np.testing.assert_allclose(np.asarray(res.pred_iou)[ours_fg],
                                   ref_iou[ref_fg], rtol=1e-4, atol=1e-5)
