"""VOS inference driver: multi-object mask propagation + CondInst decoding.

Reference: external/lib/test/tracker/unicorn_vos.py:13-236. TPU re-design:
  * objects live in a fixed number of slots K (static shapes); per-object
    label maps propagate through ONE streaming correlation pass (the (K, N)
    "values" matrix rides the same transfer matrix).
  * the SOT head runs once with the object dimension folded into the batch
    axis (the reference loops objects through the head, :157-203).
  * per-object best boxes select their controller params; dynamic-conv masks
    decode on device; soft-aggregation (STM-style, :102-122) merges
    overlapping instance masks into one indexed map on device.
"""
from __future__ import annotations

import numpy as np

from ..data.preproc import letterbox, letterbox_mask
from ..models.heads import decode_for_inference, flatten_raw_outputs
from ..models.mask_head import anchor_locations_and_levels
from ..models.unicorn import Unicorn
from ..ops.correlation import resize_bilinear_torch
from ..ops.dynamic_conv import aligned_bilinear, convex_upsample, dynamic_mask_logits
from ..ops.nms import postprocess_device


class VOSDriver:
    def __init__(self, model: Unicorn, params, input_size=(800, 1280),
                 max_objects: int = 4, conf_thre: float = 0.001,
                 nms_thre: float = 0.65, mask_thres: float = 0.3,
                 d_rate: int = 4, use_raft: bool = False, up_rate: int = 8):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.params = params
        self.input_size = tuple(input_size)
        self.K = max_objects
        self.mask_thres = mask_thres
        self._jnp = jnp
        H, W = self.input_size
        H8, W8 = H // 8, W // 8
        K = max_objects

        def init_fn(params, frame, obj_masks):
            """obj_masks: (K, H, W) binary per-object masks (zero = empty slot).
            Returns (feat16_ref (1, H16, W16, C), lbs_ref (K, 1, H8*W8))."""
            feat16 = model.apply(params, frame, run_fpn=False,
                                 method=Unicorn.forward_backbone)
            lbs = resize_bilinear_torch(obj_masks[..., None], H8, W8)
            return feat16, lbs.reshape(K, 1, H8 * W8)

        def track_fn(params, feat_ref, lbs_ref, frame):
            """feat_ref: (K, H16, W16, C) per-slot reference features (objects
            entering mid-video carry their own entry frame, reference
            unicorn_vos.py:86-101); lbs_ref: (K, 1, N8) per-slot label maps.
            Interaction runs batched over the K (ref, cur) pairs."""
            from ..ops.pallas_correlation import correlation_propagate_auto

            fpn_outs, feat_cur = model.apply(params, frame,
                                             method=Unicorn.forward_backbone)
            cur_k = jnp.broadcast_to(feat_cur, (K,) + feat_cur.shape[1:])
            new_ref, new_cur = model.apply(
                params, feat_ref.astype(jnp.float32),
                cur_k.astype(jnp.float32),
                method=Unicorn.forward_interaction)
            emb_ref = model.apply(params, new_ref, method=Unicorn.forward_upsample)
            emb_cur = model.apply(params, new_cur, method=Unicorn.forward_upsample)
            _, h8, w8, c = emb_cur.shape
            priors_k = correlation_propagate_auto(
                emb_ref.reshape(K, h8 * w8, c).astype(jnp.float32),
                emb_cur.reshape(K, h8 * w8, c).astype(jnp.float32),
                lbs_ref,
            ).reshape(K, h8, w8, 1)  # one prior map per object slot

            # head over K object-slots: broadcast fpn feats along batch
            fpn_k = tuple(jnp.broadcast_to(f, (K,) + f.shape[1:]) for f in fpn_outs)
            priors = (
                priors_k,
                resize_bilinear_torch(priors_k, h8 // 2, w8 // 2),
                resize_bilinear_torch(priors_k, h8 // 4, w8 // 4),
            )
            priors = tuple(p.astype(f.dtype) for p, f in zip(priors, fpn_k))
            raw = model.apply(params, fpn_k, priors, method=Unicorn.forward_head)
            dec = decode_for_inference(raw, (8, 16, 32), mode="sot")
            dets, valid = postprocess_device(
                dec, num_classes=1, conf_thre=conf_thre, nms_thre=nms_thre,
                class_agnostic=True, n_cand=256, max_out=8,
            )  # (K, 8, 7)

            masks_up = None
            if model.use_mask:
                flat = flatten_raw_outputs(raw, "sot")
                mask_feats, up_mask, _ = model.apply(
                    params, fpn_k, method=Unicorn.forward_mask_branch)
                hw = [(f.shape[1], f.shape[2]) for f in fpn_k]
                locs, lvls = anchor_locations_and_levels(hw, (8, 16, 32))
                # best anchor per object = top det's anchor; recover via
                # nearest-anchor match on the best det center at its level
                A = flat["ctrl"].shape[1]
                best_center = (dets[:, 0, :2] + dets[:, 0, 2:4]) / 2.0  # (K, 2)
                d2 = jnp.sum((locs[None] - best_center[:, None]) ** 2, -1)
                best_anchor = jnp.argmin(d2, axis=1)  # (K,)
                params_k = jnp.take_along_axis(
                    flat["ctrl"], best_anchor[:, None, None], axis=1)[:, 0]
                logits = jax.vmap(
                    lambda mf, p, l, lv: dynamic_mask_logits(
                        mf, p[None], l[None], lv[None])[0]
                )(mask_feats, params_k, locs[best_anchor], lvls[best_anchor])
                if use_raft and up_mask is not None:
                    masks_up = jax.vmap(
                        lambda lg, um: convex_upsample(lg[None], um, up_rate)[0]
                    )(logits, up_mask)
                else:
                    masks_up = aligned_bilinear(logits, 2)  # stride 4
                masks_up = jax.nn.sigmoid(masks_up)  # (K, Hm, Wm)
            return dets, valid, masks_up

        def aggregate_fn(mask_probs, obj_valid):
            """Soft-aggregate (K, Hm, Wm) probs into an indexed map
            (unicorn_vos.py:102-122): p_k / (1-p_k) odds normalization with
            background; argmax -> labels {0..K}."""
            p = jnp.clip(mask_probs * obj_valid[:, None, None], 1e-7, 1 - 1e-7)
            bg = jnp.prod(1.0 - p, axis=0, keepdims=True)  # (1, Hm, Wm)
            odds = jnp.concatenate([bg / (1 - bg + 1e-7), p / (1 - p)], axis=0)
            probs = odds / jnp.sum(odds, axis=0, keepdims=True)
            return jnp.argmax(probs, axis=0)  # 0 = bg, k = object k

        self._init_fn = jax.jit(init_fn)
        self._track_fn = jax.jit(track_fn)
        self._aggregate = jax.jit(aggregate_fn)
        self.feat_ref = None   # (K, H16, W16, C) per-slot reference features
        self.lbs_ref = None    # (K, 1, N8) per-slot label maps
        self.obj_valid = np.zeros((K,), np.float32)
        self.obj_ids: list = []  # slot -> original object id

    def _preproc(self, image):
        img, r = letterbox(image, self.input_size)
        return self._jnp.asarray(img[None]), r

    def initialize(self, image, mask):
        """mask: (H, W) int labels (0 = bg, 1..n = objects)."""
        frame, r = self._preproc(image)
        self.obj_ids = sorted(int(i) for i in np.unique(mask) if i != 0)[: self.K]
        K = self.K
        H, W = self.input_size
        obj_masks = np.zeros((K,) + mask.shape, np.float32)
        for slot, oid in enumerate(self.obj_ids):
            obj_masks[slot] = mask == oid
        lb = np.stack([
            letterbox_mask(m[..., None], self.input_size)[0][..., 0]
            for m in obj_masks
        ])
        self.obj_valid = np.zeros((K,), np.float32)
        self.obj_valid[: len(self.obj_ids)] = 1.0
        feat16, self.lbs_ref = self._init_fn(
            self.params, frame, self._jnp.asarray(lb))
        self.feat_ref = self._jnp.broadcast_to(
            feat16, (K,) + feat16.shape[1:])
        self.scale = r
        self.orig_shape = mask.shape

    def add_objects(self, image, mask):
        """Register objects that enter mid-video (unicorn_vos.py:86-101):
        ids in `mask` not yet tracked get a free slot whose reference is THIS
        frame. mask: (H, W) int labels (0 = bg)."""
        new_ids = [int(i) for i in np.unique(mask)
                   if i != 0 and int(i) not in self.obj_ids]
        if not new_ids:
            return
        frame, _ = self._preproc(image)
        K = self.K
        lb = np.zeros((K,) + self.input_size, np.float32)
        slots = []
        for oid in new_ids:
            if len(self.obj_ids) >= K:
                break  # out of slots; extra objects are dropped
            slot = len(self.obj_ids)
            m = (mask == oid).astype(np.float32)
            lb[slot] = letterbox_mask(m[..., None], self.input_size)[0][..., 0]
            slots.append((slot, oid))
        if not slots:
            return
        feat16, lbs_new = self._init_fn(self.params, frame,
                                        self._jnp.asarray(lb))
        for slot, oid in slots:
            self.feat_ref = self.feat_ref.at[slot].set(feat16[0])
            self.lbs_ref = self.lbs_ref.at[slot].set(lbs_new[slot])
            self.obj_valid[slot] = 1.0
            self.obj_ids.append(oid)

    def track(self, image):
        """Returns (indexed mask (H_orig, W_orig) with original object ids,
        per-object boxes dict)."""
        frame, r = self._preproc(image)
        dets, valid, masks = self._track_fn(self.params, self.feat_ref,
                                            self.lbs_ref, frame)
        boxes = {}
        dets = np.asarray(dets)
        for slot, oid in enumerate(self.obj_ids):
            d = dets[slot][np.asarray(valid[slot])]
            if len(d):
                boxes[oid] = (d[0, :4] / r).tolist()
        if masks is None:
            return None, boxes
        merged = np.asarray(self._aggregate(
            masks, self._jnp.asarray(self.obj_valid)))
        # map slot labels back to original object ids; unletterbox
        Hm, Wm = merged.shape
        H, W = self.orig_shape
        d_rate_h = self.input_size[0] // Hm
        rh = int(round(H * r)) // d_rate_h
        rw = int(round(W * r)) // d_rate_h
        crop = merged[:rh, :rw]
        import cv2

        resized = cv2.resize(crop.astype(np.uint8), (W, H),
                             interpolation=cv2.INTER_NEAREST)
        out = np.zeros_like(resized)
        for slot, oid in enumerate(self.obj_ids):
            out[resized == slot + 1] = oid
        return out, boxes
