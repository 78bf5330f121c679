"""MOT streaming drivers: ByteTrack (detection-only) and QDTrack (embedding)
association.

Reference call stacks: SURVEY.md §3.2 (tools/track.py ByteTrack path) and
§3.4 (track_omni embedding path, mot_evaluator.py:815-847). TPU design:
per-frame jitted step keeps everything on device; for the embedding path the
previous frame's stride-16 feature is carry state on device and instance
embeddings are grid-sampled at box centers inside the jit.
"""
from __future__ import annotations

import numpy as np

from ..data.preproc import letterbox
from ..losses.uni import sample_instance_embeddings
from ..models.heads import decode_for_inference
from ..models.unicorn import Unicorn
from ..ops.nms import postprocess_device
from ..tracker.byte_tracker import ByteTracker
from ..tracker.qd_tracker import QuasiDenseEmbedTracker


class MOTDriver:
    """ByteTrack path: detection per frame, motion-only association."""

    def __init__(self, model: Unicorn, params, input_size=(800, 1280),
                 num_classes: int = 1, conf_thre: float = 0.01,
                 nms_thre: float = 0.65, track_thresh: float = 0.6,
                 track_buffer: int = 30, match_thresh: float = 0.9,
                 max_out: int = 128):
        import jax
        import jax.numpy as jnp

        self.input_size = tuple(input_size)
        self.params = params
        self._jnp = jnp

        def step(params, frame_u8):
            frame = frame_u8.astype(jnp.float32)  # uint8 upload, cast on chip
            raw, _ = model.apply(params, frame, method=Unicorn.forward_whole)
            dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
            return postprocess_device(
                dec, num_classes=num_classes, conf_thre=conf_thre,
                nms_thre=nms_thre, n_cand=512, max_out=max_out,
            )

        self._step = jax.jit(step)
        self.tracker = ByteTracker(track_thresh, track_buffer, match_thresh)

    def reset(self, **kw):
        self.tracker = ByteTracker(**{**dict(track_thresh=0.6,
                                             track_buffer=30,
                                             match_thresh=0.9), **kw})

    def update(self, image):
        """image: HWC uint8. Returns list of active TrackViews."""
        img, r = letterbox(image, self.input_size)
        dets, valid = self._step(
            self.params, self._jnp.asarray(img[None].astype("uint8")))
        dets = np.asarray(dets[0])[np.asarray(valid[0])]
        if len(dets) == 0:
            return self.tracker.update(np.zeros((0, 4)), np.zeros((0,)))
        return self.tracker.update(dets[:, :4] / r,
                                   dets[:, 4] * dets[:, 5], dets[:, 6])


class MOTOmniDriver:
    """QDTrack path: detection + embedding association
    (mot_evaluator.py:702-1107)."""

    def __init__(self, model: Unicorn, params, input_size=(800, 1280),
                 num_classes: int = 1, conf_thre: float = 0.01,
                 nms_thre: float = 0.65, max_out: int = 128,
                 qd_params: dict | None = None, with_mask: bool = False,
                 mask_thres: float = 0.3, d_rate: int = 4,
                 tracker: str = "qd", use_raft: bool = False,
                 up_rate: int = 8):
        import jax
        import jax.numpy as jnp

        self.input_size = tuple(input_size)
        self.params = params
        self._jnp = jnp
        self.with_mask = with_mask
        self.mask_thres = mask_thres

        def step(params, frame, feat_prev, has_prev):
            """Returns (dets, valid, embeds, feat_cur[, masks]) — masks are
            per-kept-detection CondInst sigmoid maps (max_out, Hm, Wm) on the
            stride-4 mask grid, the reference's postprocess_inst decode
            (utils/boxes.py:80-153) fused into the same jitted step."""
            import jax

            from ..models.heads import flatten_raw_outputs
            from ..models.mask_head import anchor_locations_and_levels
            from ..ops.dynamic_conv import (
                aligned_bilinear, convex_upsample, dynamic_mask_logits,
            )

            # uint8 on the wire, cast on chip (4x less H2D over the
            # latency-bound link — same convention as SOTDriver/MOTDriver)
            frame = frame.astype(jnp.float32)
            fpn_outs, feat_cur = model.apply(params, frame,
                                             method=Unicorn.forward_backbone)
            priors = tuple(jnp.zeros(f.shape[:3] + (1,), f.dtype)
                           for f in fpn_outs)
            raw = model.apply(params, fpn_outs, priors,
                              method=Unicorn.forward_head)
            dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
            dets, valid, anchor_idx = postprocess_device(
                dec, num_classes=num_classes, conf_thre=conf_thre,
                nms_thre=nms_thre, n_cand=512, max_out=max_out,
                return_idx=True,
            )
            # interaction vs previous frame (first frame: itself)
            fp = jnp.where(has_prev, feat_prev, feat_cur)
            _, new_cur = model.apply(
                params, fp.astype(jnp.float32), feat_cur.astype(jnp.float32),
                method=Unicorn.forward_interaction)
            emb_map = model.apply(params, new_cur,
                                  method=Unicorn.forward_upsample)[0]
            centers = (dets[0, :, :2] + dets[0, :, 2:4]) / 2.0
            embeds = sample_instance_embeddings(
                emb_map.astype(jnp.float32), centers)
            # pack dets (7 cols) + validity + embeds into ONE tensor so the
            # host pays a single D2H fetch (the link is latency-bound; the
            # sibling drivers pack the same way)
            packed = jnp.concatenate(
                [dets[0].astype(jnp.float32),
                 valid[0][:, None].astype(jnp.float32), embeds], axis=1)
            outs = [packed, feat_cur]
            if with_mask:
                flat = flatten_raw_outputs(raw, "mot")
                mask_feats, up_mask, _ = model.apply(
                    params, fpn_outs, method=Unicorn.forward_mask_branch)
                hw = [(f.shape[1], f.shape[2]) for f in fpn_outs]
                locs, lvls = anchor_locations_and_levels(hw, (8, 16, 32))
                idx = anchor_idx[0]                         # (max_out,)
                ctrl_sel = flat["ctrl"][0, idx]             # (max_out, 169)
                logits = dynamic_mask_logits(
                    mask_feats[0], ctrl_sel, locs[idx], lvls[idx])
                if use_raft and up_mask is not None:
                    m = convex_upsample(logits, up_mask[0], up_rate)
                else:
                    m = aligned_bilinear(logits, 2)          # stride 4
                # fp16 fetch: threshold-grade precision, half the wire bytes
                outs.append(jax.nn.sigmoid(m).astype(jnp.float16))
            return tuple(outs)

        self._step = jax.jit(step)
        self.qd_params = qd_params or {}
        # "qd" (default) or "deepsort" — the reference's evaluate_deepsort
        # association (mot_evaluator.py:369-490) on the same fused step, with
        # the model's embedding head as the appearance net (tracker/legacy.py)
        self.tracker_kind = tracker
        self.tracker = self._make_tracker()
        # stride-16 feature shape for the zero placeholder (first frame)
        H, W = self.input_size
        feat_shape = jax.eval_shape(
            lambda p, x: model.apply(p, x, run_fpn=False,
                                     method=Unicorn.forward_backbone),
            params, jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32))
        self._feat16_shape = (feat_shape.shape, feat_shape.dtype)
        self.feat_prev = None
        self.frame_id = 0
        self._model = model

    def _make_tracker(self):
        if self.tracker_kind == "deepsort":
            from ..tracker.legacy import DeepSort
            return DeepSort()
        return QuasiDenseEmbedTracker(**self.qd_params)

    def reset(self):
        self.tracker = self._make_tracker()
        self.feat_prev = None
        self.frame_id = 0

    def update(self, image):
        """Returns (bboxes (N, 5) image coords, labels, track_ids) — plus
        masks (N, Hm, Wm) float probs on the mask grid, row-aligned with the
        tracker output via match(return_index=True), when with_mask (the
        reference's masks=masks[indexs] realignment, mot_evaluator.py:850).
        Also stores self.last_scale = the letterbox ratio r for mask
        resizing."""
        img, r = letterbox(image, self.input_size)
        self.last_scale = r
        frame = self._jnp.asarray(img[None].astype(np.uint8))
        if self.feat_prev is None:
            # shape-compatible zero feature; has_prev=False selects feat_cur
            self.feat_prev = self._jnp.zeros(*self._feat16_shape)
            has_prev = self._jnp.asarray(False)
        else:
            has_prev = self._jnp.asarray(True)
        out = self._step(self.params, frame, self.feat_prev, has_prev)
        packed, feat_cur = out[:2]
        masks_np = (np.asarray(out[2], np.float32)
                    if self.with_mask and len(out) > 2 else None)
        self.feat_prev = feat_cur  # stays on device
        self.frame_id += 1
        packed = np.asarray(packed)  # one fetch: dets | valid | embeds
        dets = packed[:, :7]
        valid = packed[:, 7] > 0.5
        embeds = packed[:, 8:]
        k = valid.sum()
        if self.tracker_kind == "deepsort":
            # empty frames still step the tracker: the Kalman table must
            # predict and ages must advance, or an occlusion gap would leave
            # stale gates and immortal tracks (the evaluator path steps it
            # every frame too)
            d = dets[valid]
            boxes = d[:, :4] / r if k else np.zeros((0, 4))
            scrs = d[:, 4] * d[:, 5] if k else np.zeros((0,))
            cls = d[:, 6].astype(int) if k else np.zeros((0,), int)
            fts = embeds[valid] if k else np.zeros((0, 1))
            views = self.tracker.update(boxes, scrs, fts, cls)

            def _ds_masks(n_views):
                """DeepSORT mask alignment via last_det_indices (-1 rows =
                track coasting without a detection -> zero mask)."""
                mv = masks_np[valid]
                hm, wm = mv.shape[1:]  # (0, Hm, Wm) when no dets pass
                out_m = np.zeros((n_views, hm, wm), np.float32)
                for j, di in enumerate(self.tracker.last_det_indices):
                    if di >= 0:
                        out_m[j] = mv[di]
                return out_m

            if not views:
                empty = (np.zeros((0, 5)), np.zeros((0,), int),
                         np.zeros((0,), int))
                return empty + (_ds_masks(0),) if self.with_mask else empty
            out = np.asarray([[*t.tlbr, t.score] for t in views])
            ids = np.asarray([t.track_id for t in views], int)
            labels = np.asarray([t.cls for t in views], int)
            if self.with_mask:
                return out, labels, ids, _ds_masks(len(views))
            return out, labels, ids
        if k == 0:
            empty = (np.zeros((0, 5)), np.zeros((0,), int),
                     np.zeros((0,), int))
            if self.with_mask:
                m0 = (np.zeros((0, 1, 1), np.float32) if masks_np is None
                      else masks_np[:0])
                return empty + (m0,)
            return empty
        d = dets[valid]
        bboxes5 = np.concatenate(
            [d[:, :4] / r, (d[:, 4] * d[:, 5])[:, None]], axis=1)
        bboxes, labels, ids, index = self.tracker.match(
            bboxes5, d[:, 6].astype(int), embeds[valid], self.frame_id,
            return_index=True)
        keep = ids > -1
        if self.with_mask:
            masks_out = masks_np[valid][index][keep]
            return bboxes[keep], labels[keep], ids[keep], masks_out
        return bboxes[keep], labels[keep], ids[keep]
