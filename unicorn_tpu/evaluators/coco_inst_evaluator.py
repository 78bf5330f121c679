"""COCO instance-segmentation evaluator: box AP + mask AP with RLE masks.

Reference: unicorn/evaluators/coco_inst_evaluator.py:38-… (adds per-instance
dynamic-conv mask decode + RLE encoding to the detection loop).
"""
from __future__ import annotations

import time

import cv2
import numpy as np

from . import rle
from .coco_map import COCOMeanAP


class COCOInstEvaluator:
    def __init__(self, dataset, img_size, conf_thre, nms_thre, num_classes,
                 mask_thres: float = 0.3, d_rate: int = 4):
        self.dataset = dataset
        self.img_size = img_size
        self.conf_thre = conf_thre
        self.nms_thre = nms_thre
        self.num_classes = num_classes
        self.mask_thres = mask_thres
        self.d_rate = d_rate

    def evaluate(self, forward_inst_fn, params, max_images=None):
        """forward_inst_fn(params, images (1,H,W,3)) ->
        (dets (K, 7), valid (K,), masks (K, Hm, Wm) sigmoid scores)
        — the decode+NMS+dynamic-conv mask path on device.
        """
        n = len(self.dataset) if max_images is None else min(
            max_images, len(self.dataset))
        box_results, mask_results = [], []
        t0 = time.time()
        import jax.numpy as jnp

        for i in range(n):
            img, _, info, img_id = self.dataset[i]
            h, w = info[0], info[1]
            img_id = int(np.asarray(img_id).ravel()[0])
            dets, valid, masks = forward_inst_fn(params, jnp.asarray(img[None]))
            dets = np.asarray(dets)[np.asarray(valid)]
            masks = np.asarray(masks)[np.asarray(valid)]
            scale = min(self.img_size[0] / float(h), self.img_size[1] / float(w))
            for k in range(len(dets)):
                x1, y1, x2, y2 = dets[k, :4] / scale
                cls_idx = int(dets[k, 6])
                if cls_idx >= len(self.dataset.class_ids):
                    # unscoreable: model emits more classes than the val
                    # json defines (same guard as COCOEvaluator)
                    continue
                score = float(dets[k, 4] * dets[k, 5])
                box_results.append({
                    "image_id": img_id,
                    "category_id": self.dataset.class_ids[cls_idx],
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "score": score,
                })
                # unletterbox the mask: crop valid region, resize to original
                m = masks[k]
                crop_h = int(round(h * scale * m.shape[0] / self.img_size[0]))
                crop_w = int(round(w * scale * m.shape[1] / self.img_size[1]))
                m_c = m[:max(crop_h, 1), :max(crop_w, 1)]
                m_full = cv2.resize(m_c.astype(np.float32), (w, h),
                                    interpolation=cv2.INTER_LINEAR)
                bin_mask = (m_full > self.mask_thres).astype(np.uint8)
                mask_results.append({
                    "image_id": img_id,
                    "category_id": self.dataset.class_ids[cls_idx],
                    "segmentation": rle.encode(bin_mask),
                    "score": score,
                })
        infer_time = time.time() - t0
        gt = self.dataset.coco.dataset
        img_ids = [self.dataset.ids[i] for i in range(n)]
        box_m = COCOMeanAP(gt, "bbox").evaluate(box_results, img_ids)
        out = {"box_" + k: v for k, v in box_m.items()}
        if all("segmentation" in a for a in gt.get("annotations", [])[:1]):
            mask_m = COCOMeanAP(gt, "segm").evaluate(mask_results, img_ids)
            out.update({"mask_" + k: v for k, v in mask_m.items()})
        out["n_images"] = n
        out["infer_time_s"] = infer_time
        return out
