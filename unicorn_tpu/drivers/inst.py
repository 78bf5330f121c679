"""Instance-segmentation inference: decode + NMS + CondInst mask decode for
the kept detections, fused in one jitted function.

Reference: unicorn/utils/boxes.py:80-153 (postprocess_inst — NMS then a
dynamic-conv mask decode per kept instance) driven by tools/eval.py for the
unicorn_inst stage. TPU re-design: fixed max_out detection slots; the NMS
returns each kept row's anchor index so the CondInst controller params,
location, and fpn level are gathered in one shot and the 3-layer dynamic
head runs for all slots at once (ops/dynamic_conv.dynamic_mask_logits).
"""
from __future__ import annotations

from ..models.heads import decode_boxes, flatten_raw_outputs
from ..models.mask_head import anchor_locations_and_levels
from ..ops.dynamic_conv import (
    aligned_bilinear, convex_upsample, dynamic_mask_logits,
)
from ..ops.nms import postprocess_device


def make_inst_forward(model, num_classes: int, conf_thre: float = 0.01,
                      nms_thre: float = 0.65, max_out: int = 64,
                      n_cand: int = 512, use_raft: bool = False,
                      up_rate: int = 8, strides=(8, 16, 32)):
    """Build forward_inst_fn(params, images (1, H, W, 3)) ->
    (dets (K, 7), valid (K,), masks (K, Hm, Wm) sigmoid scores) — the
    COCOInstEvaluator contract."""
    import jax
    import jax.numpy as jnp

    def forward_inst(params, images):
        out = model.apply(params, images)
        raw, mask_out = out
        mask_feats, up_mask, _sem = mask_out
        flat = flatten_raw_outputs(raw, "mot")
        boxes = decode_boxes(flat["reg_raw"], flat["hw"], strides)
        dec = jnp.concatenate(
            [boxes, jax.nn.sigmoid(flat["obj_logits"]),
             jax.nn.sigmoid(flat["cls_logits"])], axis=-1)
        dets, valid, idx = postprocess_device(
            dec, num_classes=num_classes, conf_thre=conf_thre,
            nms_thre=nms_thre, n_cand=n_cand, max_out=max_out,
            return_idx=True)
        locs, lvls = anchor_locations_and_levels(flat["hw"], strides)
        k_idx = idx[0]
        ctrl_k = flat["ctrl"][0][k_idx]            # (K, 169)
        logits = dynamic_mask_logits(
            mask_feats[0], ctrl_k, locs[k_idx], lvls[k_idx])  # (K, h8, w8)
        if use_raft and up_mask is not None:
            masks = convex_upsample(logits, up_mask[0], up_rate)
        else:
            masks = aligned_bilinear(logits, 2)    # stride 8 -> 4
        masks = jax.nn.sigmoid(masks)
        return dets[0], valid[0], masks

    return jax.jit(forward_inst)
