"""End-to-end MASK learning test: the instance-seg stage (det losses +
CondInst dynamic-conv dice loss) trains from scratch on synthetic rectangle
masks, and the fused inst inference path (drivers/inst.make_inst_forward)
produces masks that overlap the gt.

Measured at 500 steps: condinst dice loss 0.84 -> 0.087, held-out mean mask
IoU 0.72 over 18 matched detections; thresholds below leave margin.
"""
import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from unicorn_tpu.core.train_state import TrainState
from unicorn_tpu.core.train_step import make_det_mask_train_step
from unicorn_tpu.drivers.inst import make_inst_forward
from unicorn_tpu.models.unicorn import YOLOXDet

pytestmark = pytest.mark.slow

H, W = 96, 128
D_RATE = 4
Hm, Wm = H // D_RATE, W // D_RATE


def _sample(n, rng):
    imgs = np.zeros((n, H, W, 3), np.float32)
    labels = np.zeros((n, 5, 5), np.float32)
    masks = np.zeros((n, 5, Hm, Wm), np.float32)
    for i in range(n):
        imgs[i] = rng.rand(H, W, 3) * 40
        for k in range(2):
            w, h = rng.randint(24, 40), rng.randint(20, 32)
            x, y = rng.randint(0, W - w), rng.randint(0, H - h)
            cls = rng.randint(0, 2)
            color = [220, 40, 40] if cls == 0 else [40, 40, 220]
            imgs[i, y:y + h, x:x + w] = color
            labels[i, k] = [cls, x + w / 2, y + h / 2, w, h]
            masks[i, k, y // D_RATE:(y + h) // D_RATE,
                  x // D_RATE:(x + w) // D_RATE] = 1
    return imgs, labels, masks


def test_inst_stack_learns_masks():
    rng = np.random.RandomState(0)
    model = YOLOXDet(num_classes=2, backbone_name="csp_darknet", depth=0.33,
                     width=0.25, in_channels=(256, 512, 1024),
                     use_attention=False, n_layer_att=0, use_mask=True)
    imgs0, _, _ = _sample(4, rng)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(imgs0))
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, 2e-4, 100),
         optax.constant_schedule(2e-4)], [100])
    state = TrainState.create(params, optax.adamw(sched), use_ema=False)
    step = make_det_mask_train_step(model, (H, W), use_l1=True, max_inst=8)
    first_dice = last_dice = None
    for it in range(500):
        imgs, labels, masks = _sample(4, rng)
        state, ld = step(state, jnp.asarray(imgs), jnp.asarray(labels),
                         jnp.asarray(masks))
        if it == 0:
            first_dice = float(ld["condinst_loss"])
        last_dice = float(ld["condinst_loss"])
    assert last_dice < first_dice * 0.3, (first_dice, last_dice)

    fwd = make_inst_forward(model, num_classes=2, conf_thre=0.05,
                            nms_thre=0.5, max_out=8, n_cand=64)
    erng = np.random.RandomState(99)
    imgs, labels, masks_gt = _sample(8, erng)
    ious = []
    for i in range(8):
        dets, valid, pm = fwd(state.params, jnp.asarray(imgs[i:i + 1]))
        dets, valid, pm = np.asarray(dets), np.asarray(valid), np.asarray(pm)
        for k in np.flatnonzero(valid):
            x1, y1, x2, y2 = dets[k, :4]
            best, bi = 0.0, -1
            for g in range(2):
                _, cx, cy, w, h = labels[i, g]
                gx1, gy1 = cx - w / 2, cy - h / 2
                gx2, gy2 = cx + w / 2, cy + h / 2
                ix = max(0.0, min(x2, gx2) - max(x1, gx1)) \
                    * max(0.0, min(y2, gy2) - max(y1, gy1))
                u = (x2 - x1) * (y2 - y1) + w * h - ix
                if u > 0 and ix / u > best:
                    best, bi = ix / u, g
            if bi >= 0 and best > 0.5:
                pred_m = (pm[k] > 0.5).astype(np.float32)
                gt_m = masks_gt[i, bi]
                inter = float((pred_m * gt_m).sum())
                union = float(((pred_m + gt_m) > 0).sum())
                ious.append(inter / max(union, 1.0))
    assert len(ious) >= 8, len(ious)
    assert float(np.mean(ious)) > 0.5, np.mean(ious)
