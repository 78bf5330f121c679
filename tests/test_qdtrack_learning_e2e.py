"""End-to-end QDTRACK learning test: train the unified 2-frame step from
scratch (detection + contrastive embedding loss), then track a synthetic
video with MOTOmniDriver — association by LEARNED embeddings (bisoftmax),
not IoU/Kalman — and score it with CLEAR-MOT.

This is the claim the fused-ByteTrack learning test cannot make: the
mot contrastive loss (losses/uni.py) actually produces instance-
discriminative embeddings that the QDTrack protocol can associate on.
Reference path: mot_evaluator.py:702-1107 + QuasiDenseEmbedTracker.
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unicorn_tpu.core.train_state import TrainState
from unicorn_tpu.core.train_step import make_uni_train_step
from unicorn_tpu.drivers.mot import MOTOmniDriver
from unicorn_tpu.evaluators.mot_metrics import MOTAccumulator
from unicorn_tpu.models.unicorn import Unicorn

pytestmark = pytest.mark.slow

H, W = 64, 96


def _draw(img, x, y, w, h, cls):
    color = [220, 40, 40] if cls == 0 else [40, 40, 220]
    img[max(0, int(y)):int(y + h), max(0, int(x)):int(x + w)] = color


def _sample_pair(n, rng):
    imgs = np.zeros((n, 2, H, W, 3), np.float32)
    targets = np.zeros((n, 2, 5, 6), np.float32)
    for i in range(n):
        for f in range(2):
            imgs[i, f] = rng.rand(H, W, 3) * 40
        for k in range(2):
            w, h = rng.randint(20, 32), rng.randint(16, 26)
            x, y = rng.randint(0, W - w - 6), rng.randint(0, H - h - 6)
            dx, dy = rng.randint(-4, 5), rng.randint(-4, 5)
            cls = rng.randint(0, 2)
            _draw(imgs[i, 0], x, y, w, h, cls)
            x2, y2 = np.clip(x + dx, 0, W - w), np.clip(y + dy, 0, H - h)
            _draw(imgs[i, 1], x2, y2, w, h, cls)
            targets[i, 0, k] = [cls, x + w / 2, y + h / 2, w, h, k + 1]
            targets[i, 1, k] = [cls, x2 + w / 2, y2 + h / 2, w, h, k + 1]
    return imgs, targets


def test_qdtrack_embedding_association_on_learned_model():
    rng = np.random.RandomState(0)
    model = Unicorn(num_classes=2, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    imgs0, _ = _sample_pair(1, rng)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0[:1, 0]),
                        method=Unicorn.init_all)
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, 2e-4, 100),
         optax.constant_schedule(2e-4)], [100])
    state = TrainState.create(params, optax.adamw(sched), use_ema=False)
    step = make_uni_train_step(model, (H, W), num_classes=2, use_l1=True)
    first_mot = last_mot = None
    for it in range(400):
        imgs, targets = _sample_pair(2, rng)
        task_ids = jnp.asarray([1, 2] if it % 2 == 0 else [2, 1], jnp.int32)
        state, ld = step(state, jnp.asarray(imgs), jnp.asarray(targets),
                         task_ids)
        if it == 0:
            first_mot = float(ld.get("mot_loss", ld["total_loss"]))
        last_mot = float(ld.get("mot_loss", ld["total_loss"]))
    assert np.isfinite(last_mot) and last_mot < first_mot, \
        (first_mot, last_mot)

    driver = MOTOmniDriver(
        model, state.params, input_size=(H, W), num_classes=2,
        conf_thre=0.1, nms_thre=0.5, max_out=8,
        qd_params=dict(init_score_thr=0.3, obj_score_thr=0.2,
                       match_score_thr=0.5),
    )
    erng = np.random.RandomState(7)
    T = 16
    gts = {}
    x, y, w, h = 10.0, 20.0, 24, 20
    x2, y2, w2, h2 = 60.0, 30.0, 22, 18
    acc = MOTAccumulator(iou_thr=0.5)
    for t in range(T):
        frame = (erng.rand(H, W, 3) * 40).astype(np.float32)
        _draw(frame, x, y, w, h, 0)
        _draw(frame, x2, y2, w2, h2, 1)
        bboxes, labels, ids = driver.update(frame.astype(np.uint8))
        acc.update([1, 2], [[x, y, x + w, y + h],
                            [x2, y2, x2 + w2, y2 + h2]],
                   [int(i) for i in ids], bboxes[:, :4])
        x += 1.5
        y += 0.5
        x2 -= 1.2
        y2 += 0.8
    m = acc.metrics()
    # learned embeddings must associate both objects consistently
    assert m["MOTA"] > 0.5, m
    assert m["IDsw"] <= 2, m
