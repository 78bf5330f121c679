"""BoxInst box-supervised instance segmentation losses, TPU-native.

The reference gates this branch behind cfg MODEL.BOXINST.ENABLED
(unicorn/models/condinst/dynamic_mask_head.py:110-115, 251-273) and leans on
the external AdelaiDet package for `unfold_wo_center` / color similarity /
projection term; here the whole branch is self-contained jax, built from the
BoxInst paper's published formulation (Tian et al., CVPR 2021):

  * projection term: dice between the x/ y max-projections of the predicted
    mask probability and of the gt box rectangle,
  * pairwise term: -log P(same label) over a dilated k x k neighborhood,
    supervised only where the LAB color similarity exceeds a threshold
    inside the gt box.

Everything is static-shape: neighborhoods are unrolled shifts (k and
dilation are Python ints), instances ride the same fixed top-K anchor slots
as the fully-supervised CondInst loss (losses/mask.py).

Note: the reference reads cfg MODEL.BOXINST.BOTTOM_PIXELS_REMOVED
(dynamic_mask_head.py:111) but its repo never consumes it (the consumer is
non-vendored AdelaiDet prep code), so this port omits it too.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.mask_head import anchor_locations_and_levels
from .mask import dice_per_instance, select_topk_mask_logits


def unfold_wo_center(x, kernel_size: int, dilation: int):
    """(N, H, W) -> (N, k*k-1, H, W): the dilated k x k neighborhood of every
    pixel, center excluded, zero padding at borders (F.unfold semantics)."""
    assert kernel_size % 2 == 1
    pad = dilation * (kernel_size // 2)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    H, W = x.shape[1:]
    outs = []
    for dy in range(kernel_size):
        for dx in range(kernel_size):
            if dy == kernel_size // 2 and dx == kernel_size // 2:
                continue
            outs.append(xp[:, dy * dilation:dy * dilation + H,
                           dx * dilation:dx * dilation + W])
    return jnp.stack(outs, axis=1)


def compute_pairwise_term(mask_logits, kernel_size: int = 3,
                          dilation: int = 2):
    """(N, H, W) logits -> (N, k*k-1, H, W) pairwise loss: -log P(y_i = y_j)
    with P = p_i p_j + (1-p_i)(1-p_j), evaluated in log space
    (dynamic_mask_head.py:19-50 semantics)."""
    log_fg = jax.nn.log_sigmoid(mask_logits)
    log_bg = jax.nn.log_sigmoid(-mask_logits)
    log_fg_n = unfold_wo_center(log_fg, kernel_size, dilation)
    log_bg_n = unfold_wo_center(log_bg, kernel_size, dilation)
    log_same_fg = log_fg[:, None] + log_fg_n
    log_same_bg = log_bg[:, None] + log_bg_n
    m = jnp.maximum(log_same_fg, log_same_bg)
    log_same = jnp.log(jnp.exp(log_same_fg - m)
                       + jnp.exp(log_same_bg - m)) + m
    return -log_same


def compute_project_term(mask_scores, gt_bitmasks):
    """(N, H, W) each -> (N,) : dice between max-projections onto both axes,
    summed (the BoxInst projection loss — the box supervises only the mask's
    row/column supports; reference dynamic_mask_head.py:7-16 sums x and y
    before the instance mean). Dice formula shared with the supervised loss
    (losses/mask.dice_per_instance — same eps/normalization)."""
    lx = dice_per_instance(jnp.max(mask_scores, axis=1),
                           jnp.max(gt_bitmasks, axis=1))
    ly = dice_per_instance(jnp.max(mask_scores, axis=2),
                           jnp.max(gt_bitmasks, axis=2))
    return lx + ly


def rgb_to_lab(rgb):
    """(..., 3) sRGB in [0, 255] -> CIELAB (L in [0,100], a/b centered at 0),
    D65, the skimage/cv2-float convention the BoxInst color term assumes."""
    x = rgb / 255.0
    x = jnp.where(x > 0.04045, ((x + 0.055) / 1.055) ** 2.4, x / 12.92)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    # normalize by D65 white point
    X = X / 0.950456
    Z = Z / 1.088754
    def f(t):
        return jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)
    fX, fY, fZ = f(X), f(Y), f(Z)
    L = jnp.where(Y > 0.008856, 116.0 * jnp.cbrt(Y) - 16.0, 903.3 * Y)
    a = 500.0 * (fX - fY)
    bb = 200.0 * (fY - fZ)
    return jnp.stack([L, a, bb], axis=-1)


def images_color_similarity(img_lab, kernel_size: int = 3,
                            dilation: int = 2):
    """(H, W, 3) LAB image -> (k*k-1, H, W) neighbor similarity
    exp(-||c_i - c_j|| * 0.5) (the BoxInst S_e with sigma = 2)."""
    chans = jnp.moveaxis(img_lab, -1, 0)                   # (3, H, W)
    neigh = unfold_wo_center(chans, kernel_size, dilation)  # (3, K, H, W)
    diff = chans[:, None] - neigh
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=0) + 1e-12)   # (K, H, W)
    return jnp.exp(-dist * 0.5)


def boxes_to_bitmasks(boxes_cxcywh, valid, Hm: int, Wm: int, stride: float):
    """(M, 4) cxcywh at input scale -> (M, Hm, Wm) box rectangles on the
    mask grid (the gt_bitmasks BoxInst substitutes for real masks)."""
    cx, cy, w, h = (boxes_cxcywh[:, i] for i in range(4))
    x1, x2 = (cx - w / 2) / stride, (cx + w / 2) / stride
    y1, y2 = (cy - h / 2) / stride, (cy + h / 2) / stride
    xs = jnp.arange(Wm, dtype=jnp.float32) + 0.5
    ys = jnp.arange(Hm, dtype=jnp.float32) + 0.5
    in_x = (xs[None, None, :] >= x1[:, None, None]) & (
        xs[None, None, :] <= x2[:, None, None])
    in_y = (ys[None, :, None] >= y1[:, None, None]) & (
        ys[None, :, None] <= y2[:, None, None])
    bm = (in_x & in_y).astype(jnp.float32)
    return bm * valid[:, None, None]


def boxinst_mask_loss(
    ctrl, mask_feats, fg_mask, matched_gt, pred_iou,
    gt_boxes,        # (B, M, 4) cxcywh, input scale
    gt_valid,        # (B, M)
    images,          # (B, H, W, 3) 0-255 training frames; BGR by default —
                     # the repo's data pipeline is cv2/BGR end to end
                     # (data/preproc.py letterbox, transforms.py HSV aug)
    hw_list, strides,
    max_inst: int = 48,
    up_masks=None, up_rate: int = 8,
    d_rate: int = 4,
    pairwise_size: int = 3, pairwise_dilation: int = 2,
    color_thresh: float = 0.3,
    warmup_factor=1.0,
    bgr: bool = True,
):
    """Box-supervised replacement for condinst_mask_loss: returns
    (loss_prj, loss_pairwise * warmup_factor) with the same fixed top-K
    anchor slotting (losses/mask.select_topk_mask_logits). warmup_factor
    may be a traced scalar (min(iter/warmup_iters, 1),
    dynamic_mask_head.py:267). bgr=True flips channels before the LAB
    conversion so the color-pairwise term sees true R/G/B."""
    B, A = fg_mask.shape
    locs, lvls = anchor_locations_and_levels(hw_list, strides)
    H, W = images.shape[1:3]
    Hm, Wm = H // d_rate, W // d_rate

    # LAB color similarity at the mask grid (adet downsamples the image to
    # mask stride before the similarity)
    rgb = images[..., ::-1] if bgr else images
    imgs_small = jax.image.resize(rgb, (B, Hm, Wm, 3), "bilinear")
    sim = jax.vmap(lambda im: images_color_similarity(
        rgb_to_lab(im), pairwise_size, pairwise_dilation))(imgs_small)

    def per_image(ctrl_i, mf_i, fg_i, mgt_i, piou_i, gtb_i, gtv_i, sim_i,
                  upm_i):
        valid_b, topi, logits = select_topk_mask_logits(
            ctrl_i, mf_i, fg_i, piou_i, locs, lvls, max_inst, upm_i,
            up_rate, Hm, Wm)
        valid = valid_b.astype(jnp.float32)
        bms = boxes_to_bitmasks(gtb_i, gtv_i, Hm, Wm, float(d_rate))
        tgts = bms[mgt_i[topi]]                       # (K, Hm, Wm)
        scores = jax.nn.sigmoid(logits)
        prj = compute_project_term(scores, tgts)      # (K,)
        pw = compute_pairwise_term(logits, pairwise_size, pairwise_dilation)
        w = (sim_i[None] >= color_thresh).astype(jnp.float32) \
            * tgts[:, None] * valid[:, None, None, None]
        pw_num = jnp.sum(pw * w)
        pw_den = jnp.sum(w)
        return jnp.sum(prj * valid), jnp.sum(valid), pw_num, pw_den

    if up_masks is None:
        outs = jax.vmap(
            lambda c, m, f, g, p, b, v, s: per_image(c, m, f, g, p, b, v, s,
                                                     None)
        )(ctrl, mask_feats, fg_mask, matched_gt, pred_iou, gt_boxes,
          gt_valid, sim)
    else:
        outs = jax.vmap(per_image)(
            ctrl, mask_feats, fg_mask, matched_gt, pred_iou, gt_boxes,
            gt_valid, sim, up_masks)
    prj_sum, cnt, pw_num, pw_den = outs
    loss_prj = jnp.sum(prj_sum) / jnp.maximum(jnp.sum(cnt), 1.0)
    loss_pw = jnp.sum(pw_num) / jnp.maximum(jnp.sum(pw_den), 1.0)
    return loss_prj, loss_pw * warmup_factor
