"""End-to-end VOS learning test: train the mask stage (VOS propagation +
MOTS CondInst losses, alternating) from scratch on synthetic moving
rectangles, then run the VOSDriver over a synthetic video and score the
propagated masks' J (IoU) against gt.

Measured at 300 steps: condinst_vos dice 0.83 -> 0.26, driver J mean 0.73
over 6 frames; thresholds below leave margin. Completes the learning-test
quartet (det AP, tracking MOTA, inst masks, VOS propagation).
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unicorn_tpu.core.train_state import TrainState
from unicorn_tpu.core.train_step import make_uni_mask_train_step
from unicorn_tpu.drivers.vos import VOSDriver
from unicorn_tpu.models.unicorn import Unicorn

pytestmark = pytest.mark.slow

H, W = 64, 96
D_RATE = 2
Hm, Wm = H // D_RATE, W // D_RATE


def _draw(img, x, y, w, h, cls):
    color = [220, 40, 40] if cls == 0 else [40, 40, 220]
    img[max(0, int(y)):int(y + h), max(0, int(x)):int(x + w)] = color


def _sample_pair(n, rng):
    imgs = np.zeros((n, 2, H, W, 3), np.float32)
    targets = np.zeros((n, 2, 5, 6), np.float32)
    masks = np.zeros((n, 2, 5, Hm, Wm), np.float32)
    for i in range(n):
        for f in range(2):
            imgs[i, f] = rng.rand(H, W, 3) * 40
        for k in range(2):
            w, h = rng.randint(20, 32), rng.randint(16, 26)
            x, y = rng.randint(0, W - w - 6), rng.randint(0, H - h - 6)
            dx, dy = rng.randint(-4, 5), rng.randint(-4, 5)
            cls = rng.randint(0, 2)
            x2, y2 = np.clip(x + dx, 0, W - w), np.clip(y + dy, 0, H - h)
            _draw(imgs[i, 0], x, y, w, h, cls)
            _draw(imgs[i, 1], x2, y2, w, h, cls)
            targets[i, 0, k] = [cls, x + w / 2, y + h / 2, w, h, k + 1]
            targets[i, 1, k] = [cls, x2 + w / 2, y2 + h / 2, w, h, k + 1]
            masks[i, 0, k, int(y) // D_RATE:int(y + h) // D_RATE,
                  int(x) // D_RATE:int(x + w) // D_RATE] = 1
            masks[i, 1, k, int(y2) // D_RATE:int(y2 + h) // D_RATE,
                  int(x2) // D_RATE:int(x2 + w) // D_RATE] = 1
    return imgs, targets, masks


def test_vos_stack_learns_to_propagate_masks():
    rng = np.random.RandomState(0)
    model = Unicorn(num_classes=2, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False,
                    use_mask=True)
    imgs0, _, _ = _sample_pair(1, rng)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0[:1, 0]),
                        method=Unicorn.init_all)
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, 2e-4, 100),
         optax.constant_schedule(2e-4)], [100])
    state = TrainState.create(params, optax.adamw(sched), use_ema=False)
    step = make_uni_mask_train_step(model, (H, W),
                                    d_rate=D_RATE, use_raft=False,
                                    use_l1=True, donate=False)
    first = last = None
    for it in range(300):
        imgs, targets, masks = _sample_pair(2, rng)
        task_ids = jnp.asarray([1, 2] if it % 2 == 0 else [2, 1], jnp.int32)
        state, ld = step(state, jnp.asarray(imgs), jnp.asarray(targets),
                         task_ids, jnp.asarray(masks))
        if it == 0:
            first = float(ld["condinst_loss_vos"])
        last = float(ld["condinst_loss_vos"])
    assert last < first * 0.6, (first, last)

    driver = VOSDriver(model, state.params, input_size=(H, W), max_objects=3,
                       conf_thre=0.0, mask_thres=0.4, use_raft=False)
    erng = np.random.RandomState(7)
    x, y, w, h = 20.0, 20.0, 24, 20
    img0 = erng.rand(H, W, 3) * 40
    _draw(img0, x, y, w, h, 0)
    m0 = np.zeros((H, W), np.uint8)
    m0[int(y):int(y + h), int(x):int(x + w)] = 1
    driver.initialize(img0.astype(np.uint8), m0)
    jscores = []
    for _t in range(6):
        x += 2
        y += 1
        img = erng.rand(H, W, 3) * 40
        _draw(img, x, y, w, h, 0)
        out_mask, _boxes = driver.track(img.astype(np.uint8))
        gt = np.zeros((H, W), np.uint8)
        gt[int(y):int(y + h), int(x):int(x + w)] = 1
        pm = (out_mask == 1).astype(np.float32)
        inter = float((pm * gt).sum())
        union = float(((pm + gt) > 0).sum())
        jscores.append(inter / max(union, 1.0))
    # measured mean J 0.73; generous margin
    assert float(np.mean(jscores)) > 0.4, jscores
