"""SOT inference driver: reference-frame caching + per-frame propagation.

Reference: external/lib/test/tracker/unicorn_sot.py:39-139. TPU re-design:
  * frame 0 runs one jitted `init_fn` (backbone + label-map rasterization);
    its stride-16 feature and stride-8 label map stay resident on device as
    carry state (the reference caches `out_dict_pre` host-side).
  * every later frame runs one jitted `track_fn`: backbone -> interaction with
    the cached reference feature -> embeddings -> streaming-softmax label
    propagation (ops/correlation.py) -> SOT head with the propagated prior
    pyramid -> decode -> on-device NMS -> top-K dets. Only (K, 7) detections
    cross the host link.
"""
from __future__ import annotations

import numpy as np

from ..data.preproc import letterbox
from ..models.heads import decode_for_inference
from ..models.unicorn import Unicorn
from ..ops.correlation import box_label_map, resize_bilinear_torch
from ..ops.nms import postprocess_device


class SOTDriver:
    def __init__(self, model: Unicorn, params, input_size=(800, 1280),
                 conf_thre: float = 0.001, nms_thre: float = 0.65,
                 max_inst: int = 3):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.input_size = tuple(input_size)
        self.max_inst = max_inst
        H, W = self.input_size

        def init_fn(params, frame, init_box_cxcywh):
            """frame (1, H, W, 3); init_box (1, 4) cxcywh in letterbox coords.
            Returns (feat16_ref, lbs_ref (1, 1, H8*W8))."""
            feat16 = model.apply(params, frame, run_fpn=False,
                                 method=Unicorn.forward_backbone)
            lbs_full = box_label_map(init_box_cxcywh, H, W)[..., None]
            lbs = resize_bilinear_torch(lbs_full, H // 8, W // 8)
            return feat16, lbs.reshape(1, 1, (H // 8) * (W // 8))

        def track_fn(params, feat_ref, lbs_ref, frame_u8):
            from ..ops.pallas_correlation import correlation_propagate_auto

            # uint8 -> float on device (4x less H2D traffic than float32)
            frame = frame_u8.astype(jnp.float32)
            fpn_outs, feat_cur = model.apply(params, frame,
                                             method=Unicorn.forward_backbone)
            new_ref, new_cur = model.apply(
                params, feat_ref.astype(jnp.float32),
                feat_cur.astype(jnp.float32),
                method=Unicorn.forward_interaction)
            emb_ref = model.apply(params, new_ref, method=Unicorn.forward_upsample)
            emb_cur = model.apply(params, new_cur, method=Unicorn.forward_upsample)
            b, h8, w8, c = emb_cur.shape
            prior = correlation_propagate_auto(
                emb_ref.reshape(b, h8 * w8, c).astype(jnp.float32),
                emb_cur.reshape(b, h8 * w8, c).astype(jnp.float32),
                lbs_ref,
            ).reshape(b, h8, w8, 1)
            priors = (
                prior,
                resize_bilinear_torch(prior, h8 // 2, w8 // 2),
                resize_bilinear_torch(prior, h8 // 4, w8 // 4),
            )
            priors = tuple(p.astype(f.dtype) for p, f in zip(priors, fpn_outs))
            raw = model.apply(params, fpn_outs, priors,
                              method=Unicorn.forward_head)
            dec = decode_for_inference(raw, (8, 16, 32), mode="sot")
            dets, valid = postprocess_device(
                dec, num_classes=1, conf_thre=conf_thre, nms_thre=nms_thre,
                class_agnostic=True, n_cand=256, max_out=max_inst,
            )
            # pack dets + validity -> ONE D2H fetch per frame
            return jnp.concatenate(
                [dets[0], valid[0][:, None].astype(dets.dtype)], axis=1)

        def track_batch_fn(params, feat_ref, lbs_ref, frames_u8):
            """(F, H, W, 3) uint8 -> (F, max_inst, 8) packed dets.

            SOT per-frame computation depends only on the FIXED reference
            state (feat_ref/lbs_ref), never on previous frames — so whole
            windows of a video batch through the pipeline at once (the
            reference processes frame-by-frame, unicorn_sot.py:57-75; the
            host-side best-box state update happens after the fact).
            """
            return jax.vmap(
                lambda f: track_fn(params, feat_ref, lbs_ref, f[None])
            )(frames_u8)

        self._init_fn = jax.jit(init_fn)
        self._track_fn_raw = track_fn              # bench: scan-able forms
        self._track_fn = jax.jit(track_fn)
        self._track_batch_fn_raw = track_batch_fn
        self._track_batch_fn = jax.jit(track_batch_fn)
        self._jnp = jnp
        self.state = None
        self.feat_ref = None
        self.lbs_ref = None
        self.frame_id = 0

    def _preproc_u8(self, image):
        """Letterbox on host but keep uint8 — the device casts to float
        (4x less transfer over the host link)."""
        img, r = letterbox(image, self.input_size)
        return self._jnp.asarray(img[None].astype(np.uint8)), r

    def _preproc(self, image):
        img, r = letterbox(image, self.input_size)
        return self._jnp.asarray(img[None]), r

    def initialize(self, image, init_bbox_xywh):
        """image: HWC uint8 BGR; init_bbox: [x, y, w, h] in image coords."""
        self.frame_id = 0
        frame, r = self._preproc(image)
        x, y, w, h = init_bbox_xywh
        box = np.array([[(x + w / 2) * r, (y + h / 2) * r, w * r, h * r]],
                       np.float32)
        self.feat_ref, self.lbs_ref = self._init_fn(
            self.params, frame, self._jnp.asarray(box))
        self.state = list(init_bbox_xywh)

    @staticmethod
    def update_state_from_packed(packed, r, state, input_size):
        """Host-side best-box state carry from one packed (max_inst, 8)
        result (clamp -> rescale -> xywh; carry on empty frames —
        unicorn_sot.py:57-75). Shared by track()/track_window() and the
        lockstep multi-sequence runner (harness/running.py) so all paths
        apply identical protocol logic."""
        dets = packed[packed[:, 7] > 0.5]
        if len(dets):
            boxes = dets[:, :4].copy()
            H, W = input_size
            boxes[:, 0::2] = boxes[:, 0::2].clip(0, W)
            boxes[:, 1::2] = boxes[:, 1::2].clip(0, H)
            best = boxes[0] / r
            state = [float(best[0]), float(best[1]),
                     float(best[2] - best[0]), float(best[3] - best[1])]
        return state

    def track(self, image):
        """Returns {"target_bbox": [x, y, w, h]} in original image coords."""
        self.frame_id += 1
        frame, r = self._preproc_u8(image)
        packed = np.asarray(self._track_fn(self.params, self.feat_ref,
                                           self.lbs_ref, frame))
        self.state = self.update_state_from_packed(
            packed, r, self.state, self.input_size)
        return {"target_bbox": list(self.state)}

    def track_window(self, images, window: int = 8):
        """Batched tracking of a list of frames (one fetch per window).

        Exactly equivalent to sequential `track` calls — per-frame compute
        never reads the previous frame's result. Returns a list of
        {"target_bbox": ...} per frame.

        Trade-off (measured, bench.py r3): window>1 amortizes host-link
        latency (one fetch per window — essential through a slow link) but
        pays the v5e batch>1 conv regression (window-8 device FPS 57.8 vs
        ~80 sequential); with a fast host link prefer window=1.
        """
        outs = []
        for start in range(0, len(images), window):
            chunk = images[start: start + window]
            frames, rs = [], []
            for im in chunk:
                f, r = self._preproc_u8(im)
                frames.append(f[0])
                rs.append(r)
            # pad a partial tail chunk to the full window (repeat the last
            # frame, discard its outputs): every distinct batch size is its
            # own XLA compile, and TPU compiles go through a minutes-long
            # remote queue — one shape serves every sequence length
            n_real = len(frames)
            while len(frames) < window:
                frames.append(frames[-1])
            packed = np.asarray(self._track_batch_fn(
                self.params, self.feat_ref, self.lbs_ref,
                self._jnp.stack(frames)))
            for k, r in enumerate(rs[:n_real]):
                self.frame_id += 1
                self.state = self.update_state_from_packed(
                    packed[k], r, self.state, self.input_size)
                outs.append({"target_bbox": list(self.state)})
        return outs
