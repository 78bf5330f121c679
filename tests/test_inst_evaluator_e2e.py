"""COCOInstEvaluator end-to-end: mock forward emitting gt boxes + perfect
masks must score box AP == mask AP == 1.0."""
import json
import os

import cv2
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.data.datasets.coco import COCODataset
from unicorn_tpu.data.transforms import ValTransform
from unicorn_tpu.evaluators import rle
from unicorn_tpu.evaluators.coco_inst_evaluator import COCOInstEvaluator

IMG = (64, 96)
TEST_SIZE = (64, 64)


def _make_dataset(tmp_path):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "val"))
    rng = np.random.RandomState(0)
    images, annotations = [], []
    gt = {}
    ann_id = 1
    for i in range(2):
        name = f"{i:04d}.jpg"
        cv2.imwrite(os.path.join(root, "val", name),
                    (rng.rand(*IMG, 3) * 255).astype(np.uint8))
        images.append({"id": i + 1, "file_name": name,
                       "width": IMG[1], "height": IMG[0]})
        boxes = []
        for k in range(2):
            x, y = int(rng.uniform(4, 50)), int(rng.uniform(4, 30))
            w, h = int(rng.uniform(12, 25)), int(rng.uniform(12, 20))
            mask = np.zeros(IMG, np.uint8)
            mask[y:y + h, x:x + w] = 1
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": 1,
                "bbox": [x, y, w, h], "area": int(mask.sum()), "iscrowd": 0,
                "segmentation": rle.encode(mask),
            })
            ann_id += 1
            boxes.append((x, y, w, h, mask))
        gt[i] = boxes
    d = {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "a"}]}
    json.dump(d, open(os.path.join(root, "annotations", "val.json"), "w"))
    return COCODataset(root, "val.json", "val", img_size=TEST_SIZE,
                       preproc=ValTransform()), gt


def test_inst_evaluator_perfect(tmp_path):
    ds, gt = _make_dataset(tmp_path)
    r = min(TEST_SIZE[0] / IMG[0], TEST_SIZE[1] / IMG[1])
    d_rate = 4
    Hm, Wm = TEST_SIZE[0] // d_rate, TEST_SIZE[1] // d_rate
    counter = {"i": 0}

    def forward_inst(params, images):
        boxes = gt[counter["i"]]
        counter["i"] += 1
        dets = np.zeros((4, 7), np.float32)
        masks = np.zeros((4, Hm, Wm), np.float32)
        valid = np.zeros((4,), bool)
        for k, (x, y, w, h, m) in enumerate(boxes):
            dets[k] = [x * r, y * r, (x + w) * r, (y + h) * r, 0.95, 0.9, 0]
            # mask in letterbox space downsampled by d_rate
            mb = cv2.resize(m.astype(np.float32),
                            (int(IMG[1] * r), int(IMG[0] * r)))
            full = np.zeros(TEST_SIZE, np.float32)
            full[:mb.shape[0], :mb.shape[1]] = mb
            masks[k] = cv2.resize(full, (Wm, Hm))
            valid[k] = True
        return (jnp.asarray(dets), jnp.asarray(valid), jnp.asarray(masks))

    ev = COCOInstEvaluator(ds, TEST_SIZE, conf_thre=0.3, nms_thre=0.65,
                           num_classes=1, mask_thres=0.5, d_rate=d_rate)
    m = ev.evaluate(forward_inst, None)
    assert abs(m["box_AP"] - 1.0) < 1e-6, m
    assert m["mask_AP50"] > 0.95, m
    assert m["mask_AP"] > 0.4, m   # quantization at Hm x Wm limits strict IoU
