"""COCO detection evaluator: batched on-device inference -> COCO-format
results -> own mAP (evaluators/coco_map.py).

Reference: unicorn/evaluators/coco_evaluator.py:27-250 (inference loop,
convert_to_coco_format with letterbox-scale unmapping, COCOeval). Distributed
result-gather becomes trivial single-controller accumulation; batches are
device-sharded by the caller if a mesh is active.
"""
from __future__ import annotations

import time

import numpy as np

from ..utils.boxes import postprocess


class COCOEvaluator:
    def __init__(self, dataset, img_size, conf_thre, nms_thre, num_classes,
                 batch_size: int = 1, use_device_nms: bool = True, mesh=None):
        """mesh: optional 1-D ("data",) device mesh — eval batches shard
        their leading dim across it, the TPU-native form of the reference's
        DistributedSampler + rank-gather eval (coco_evaluator.py:27-250).
        batch_size should be a multiple of the mesh size; the final partial
        batch is padded by repetition and the padding discarded."""
        self.dataset = dataset
        self.img_size = img_size
        self.conf_thre = conf_thre
        self.nms_thre = nms_thre
        self.num_classes = num_classes
        self.batch_size = batch_size
        self.use_device_nms = use_device_nms
        self.mesh = mesh

    def evaluate(self, forward_fn, params, max_images=None):
        """forward_fn(params, images (B,H,W,3)) -> decoded (B, A, 5+C)
        with cxcywh + sigmoided scores. Returns metrics dict."""
        import jax
        import jax.numpy as jnp

        from ..ops.nms import postprocess_device

        n = len(self.dataset) if max_images is None else min(max_images, len(self.dataset))
        results = []
        t0 = time.time()
        bs = self.batch_size
        for start in range(0, n, bs):
            idxs = list(range(start, min(start + bs, n)))
            imgs, infos, ids = [], [], []
            for i in idxs:
                img, _, info, img_id = self.dataset[i]
                imgs.append(img)
                infos.append(info)
                ids.append(int(np.asarray(img_id).ravel()[0]))
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                while len(imgs) % bs:     # pad final batch to the full size;
                    imgs.append(imgs[-1])  # zip against ids drops the padding
                batch = jax.device_put(
                    np.stack(imgs), NamedSharding(self.mesh, P("data")))
            else:
                batch = jnp.asarray(np.stack(imgs))
            dec = forward_fn(params, batch)
            if self.use_device_nms:
                dets, valid = postprocess_device(
                    dec, num_classes=self.num_classes, conf_thre=self.conf_thre,
                    nms_thre=self.nms_thre, n_cand=1024, max_out=256,
                )
                dets = np.asarray(dets)
                valid = np.asarray(valid)
                outputs = [dets[b][valid[b]] if valid[b].any() else None
                           for b in range(len(idxs))]
            else:
                outputs = postprocess(np.asarray(dec), self.num_classes,
                                      self.conf_thre, self.nms_thre)
            results.extend(self._to_coco(outputs, infos, ids))
        infer_time = time.time() - t0

        from .coco_map import COCOMeanAP

        gt = self.dataset.coco.dataset
        metrics = COCOMeanAP(gt, "bbox").evaluate(
            results, img_ids=[self.dataset.ids[i] for i in range(n)]
        )
        metrics["n_images"] = n
        metrics["infer_time_s"] = infer_time
        return metrics

    def _to_coco(self, outputs, infos, ids):
        """Unmap letterbox scale (coco_evaluator.py convert_to_coco_format)."""
        out = []
        for det, info, img_id in zip(outputs, infos, ids):
            if det is None or len(det) == 0:
                continue
            h, w = info[0], info[1]
            scale = min(self.img_size[0] / float(h), self.img_size[1] / float(w))
            boxes = det[:, :4] / scale
            for k in range(len(det)):
                x1, y1, x2, y2 = boxes[k]
                cls_idx = int(det[k, 6])
                if cls_idx >= len(self.dataset.class_ids):
                    # model emits more classes than the val json defines
                    # (e.g. 8-class uni head scored on the 1-category MOT
                    # val) — such detections are unscoreable, skip them
                    continue
                out.append({
                    "image_id": img_id,
                    "category_id": self.dataset.class_ids[cls_idx],
                    "bbox": [float(x1), float(y1), float(x2 - x1), float(y2 - y1)],
                    "score": float(det[k, 4] * det[k, 5]),
                })
        return out
