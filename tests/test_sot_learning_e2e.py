"""End-to-end SOT learning test: train the unified 2-frame stage (SOT
correlation-propagation loss, reference unicorn.py:315-337) from scratch on
synthetic moving rectangles, then run the SOTDriver (reference-frame cache +
per-frame propagation + SOT head, external/lib/test/tracker/unicorn_sot.py
protocol) over a synthetic video with a same-class distractor and score
per-frame IoU against gt.

Completes the per-task learning octet (det AP, BoxInst, tracking MOTA,
QDTrack ids, inst masks, VOS propagation J, MOTS sMOTSA, SOT IoU) — SOT was
the one quadrant whose learning loop closed only through parity tests.
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unicorn_tpu.core.train_state import TrainState
from unicorn_tpu.core.train_step import make_uni_train_step
from unicorn_tpu.drivers.sot import SOTDriver
from unicorn_tpu.models.unicorn import Unicorn

pytestmark = pytest.mark.slow

H, W = 64, 96


def _draw(img, x, y, w, h, bright):
    img[max(0, int(y)):int(y + h), max(0, int(x)):int(x + w)] = (
        [230, 60, 60] if bright else [60, 60, 230])


def _sample_pair(n, rng):
    """2-frame SOT pairs: two moving rectangles, ONE of which (chosen at
    random) is the labeled target — the other stays unlabeled, exactly the
    reference SOT sampling (one gt box per SOT sample). Because the target
    role is random, appearance alone carries zero signal: the head can only
    lower its loss by reading the propagated frame-0 prior, which is what
    the SOT quadrant exists to learn."""
    imgs = np.zeros((n, 2, H, W, 3), np.float32)
    targets = np.zeros((n, 2, 5, 6), np.float32)
    for i in range(n):
        for f in range(2):
            imgs[i, f] = rng.rand(H, W, 3) * 40
        tgt = rng.randint(0, 2)  # which of the two rectangles is labeled
        for k in range(2):
            w, h = rng.randint(18, 30), rng.randint(14, 24)
            x, y = rng.randint(0, W - w - 8), rng.randint(0, H - h - 8)
            dx, dy = rng.randint(-4, 5), rng.randint(-4, 5)
            x2, y2 = np.clip(x + dx, 0, W - w), np.clip(y + dy, 0, H - h)
            _draw(imgs[i, 0], x, y, w, h, bright=(k == 0))
            _draw(imgs[i, 1], x2, y2, w, h, bright=(k == 0))
            if k == tgt:
                targets[i, 0, 0] = [0, x + w / 2, y + h / 2, w, h, 1]
                targets[i, 1, 0] = [0, x2 + w / 2, y2 + h / 2, w, h, 1]
    return imgs, targets


def _iou(a, b):
    ax1, ay1, ax2, ay2 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx1, by1, bx2, by2 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    ih = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = iw * ih
    return inter / max(a[2] * a[3] + b[2] * b[3] - inter, 1e-6)


def test_sot_stack_learns_to_track():
    rng = np.random.RandomState(0)
    model = Unicorn(num_classes=1, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    imgs0, _ = _sample_pair(1, rng)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0[:1, 0]),
                        method=Unicorn.init_all)
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, 2e-4, 100),
         optax.constant_schedule(2e-4)], [100])
    state = TrainState.create(params, optax.adamw(sched), use_ema=False)
    step = make_uni_train_step(model, (H, W), num_classes=1, use_l1=True,
                               donate=False)
    first = last = None
    for it in range(300):
        imgs, targets = _sample_pair(2, rng)
        task_ids = jnp.asarray([1, 1], jnp.int32)  # SOT quadrant
        state, ld = step(state, jnp.asarray(imgs), jnp.asarray(targets),
                         task_ids)
        if it == 0:
            first = float(ld["total_loss"])
        last = float(ld["total_loss"])
    assert np.isfinite(last)
    assert last < first * 0.6, (first, last)

    # drive the SOT protocol: init on frame 0, track a moving bright target
    # past a dark same-size distractor
    driver = SOTDriver(model, state.params, input_size=(H, W),
                       conf_thre=0.0, max_inst=3)
    erng = np.random.RandomState(7)
    x, y, w, h = 18.0, 16.0, 24, 18
    dxp, dyp = 60.0, 36.0  # distractor
    img0 = erng.rand(H, W, 3) * 40
    _draw(img0, dxp, dyp, w, h, bright=False)
    _draw(img0, x, y, w, h, bright=True)
    driver.initialize(img0.astype(np.uint8), [x, y, w, h])
    ious = []
    for _t in range(6):
        x += 2
        y += 1
        dxp -= 2
        img = erng.rand(H, W, 3) * 40
        _draw(img, dxp, dyp, w, h, bright=False)
        _draw(img, x, y, w, h, bright=True)
        out = driver.track(img.astype(np.uint8))
        ious.append(_iou(np.asarray(out["target_bbox"], np.float64),
                         np.asarray([x, y, w, h], np.float64)))
    # the tracker must stay on the init target, not drift to the distractor
    assert float(np.mean(ious)) > 0.4, ious
