"""COCOEvaluator end-to-end over a synthetic on-disk dataset: a mock forward
emitting the gt boxes (in letterbox coords) must score AP == 1.0; shifted
boxes must score lower."""
import json
import os

import cv2
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.data.datasets.coco import COCODataset
from unicorn_tpu.data.transforms import ValTransform
from unicorn_tpu.evaluators.coco_evaluator import COCOEvaluator

IMG = (96, 128)  # h, w of the synthetic images
TEST_SIZE = (64, 64)


def _make_dataset(tmp_path, n_images=3):
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "val"))
    rng = np.random.RandomState(0)
    images, annotations = [], []
    ann_id = 1
    gt = {}
    for i in range(n_images):
        name = f"{i:04d}.jpg"
        cv2.imwrite(os.path.join(root, "val", name),
                    (rng.rand(*IMG, 3) * 255).astype(np.uint8))
        images.append({"id": i + 1, "file_name": name,
                       "width": IMG[1], "height": IMG[0]})
        boxes = []
        for k in range(2):
            x, y = rng.uniform(5, 60), rng.uniform(5, 40)
            w, h = rng.uniform(15, 35), rng.uniform(15, 30)
            cat = int(rng.randint(1, 3))
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": cat,
                "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
            })
            ann_id += 1
            boxes.append((x, y, w, h, cat))
        gt[i] = boxes
    d = {"images": images, "annotations": annotations,
         "categories": [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}]}
    json.dump(d, open(os.path.join(root, "annotations", "val.json"), "w"))
    ds = COCODataset(root, "val.json", "val", img_size=TEST_SIZE,
                     preproc=ValTransform())
    return ds, gt


def _mock_forward(gt, shift=0.0):
    """Returns forward_fn(params, images)->(B, A, 5+2) with dets at the gt
    boxes (letterbox coords), padded with background anchors."""
    def forward(params, images):
        B = images.shape[0]
        idx = forward.counter
        outs = []
        for b in range(B):
            boxes = gt.get(idx + b, [])
            r = min(TEST_SIZE[0] / IMG[0], TEST_SIZE[1] / IMG[1])
            rows = np.zeros((8, 7), np.float32)
            rows[:, 4] = 0.0
            for k, (x, y, w, h, cat) in enumerate(boxes):
                cx, cy = (x + w / 2) * r + shift, (y + h / 2) * r
                rows[k, :4] = [cx, cy, w * r, h * r]
                rows[k, 4] = 0.95          # obj
                rows[k, 5 + (cat - 1)] = 0.9
            outs.append(rows)
        forward.counter += B
        return jnp.asarray(np.stack(outs))

    forward.counter = 0
    return forward


def test_perfect_predictions_ap1(tmp_path):
    ds, gt = _make_dataset(tmp_path)
    ev = COCOEvaluator(ds, TEST_SIZE, conf_thre=0.3, nms_thre=0.65,
                       num_classes=2, batch_size=1)
    m = ev.evaluate(_mock_forward(gt), None)
    assert abs(m["AP"] - 1.0) < 1e-6, m
    assert abs(m["AP50"] - 1.0) < 1e-6


def test_shifted_predictions_lower_ap(tmp_path):
    ds, gt = _make_dataset(tmp_path)
    ev = COCOEvaluator(ds, TEST_SIZE, conf_thre=0.3, nms_thre=0.65,
                       num_classes=2, batch_size=1)
    m = ev.evaluate(_mock_forward(gt, shift=2.0), None)
    # a 2-letterbox-px shift (4 px original on ~20 px boxes, IoU ~ 0.67):
    # AP50 survives, AP75 dies, mean AP in between
    assert abs(m["AP50"] - 1.0) < 1e-6
    assert m["AP75"] == 0.0
    assert 0.0 < m["AP"] < 1.0


def test_mesh_sharded_eval_matches_single_device(tmp_path):
    """Data-parallel eval over the 8-device CPU mesh (reference
    DistributedSampler role): a REAL jitted, params-dependent forward with
    mesh-replicated params must accept the mesh-sharded batch (the actual
    jit + sharding combination tools/eval.py runs) and score the same AP
    as the single-device path, padding of the final partial batch included
    (6 images, batch 8)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    ds, gt = _make_dataset(tmp_path, n_images=6)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))

    # params ARE the per-image det rows (8, A, 7), replicated on the mesh as
    # tools/eval.py replicates model params; forward depends on both args
    rows_np = np.zeros((8, 8, 7), np.float32)
    for i in range(6):
        r = min(TEST_SIZE[0] / IMG[0], TEST_SIZE[1] / IMG[1])
        for k, (x, y, w, h, cat) in enumerate(gt[i]):
            rows_np[i, k, :4] = [(x + w / 2) * r, (y + h / 2) * r, w * r, h * r]
            rows_np[i, k, 4] = 0.95
            rows_np[i, k, 5 + (cat - 1)] = 0.9
    params = jax.device_put(jnp.asarray(rows_np), NamedSharding(mesh, P()))

    @jax.jit
    def forward(p, images):
        return p[:images.shape[0]] + 0.0 * jnp.mean(images)

    ev_mesh = COCOEvaluator(ds, TEST_SIZE, conf_thre=0.3, nms_thre=0.65,
                            num_classes=2, batch_size=8, mesh=mesh)
    m_mesh = ev_mesh.evaluate(forward, params)
    ev_one = COCOEvaluator(ds, TEST_SIZE, conf_thre=0.3, nms_thre=0.65,
                           num_classes=2, batch_size=2)
    m_one = ev_one.evaluate(_mock_forward(gt), None)
    assert abs(m_mesh["AP"] - m_one["AP"]) < 1e-9
    assert m_mesh["AP50"] > 0.99
