"""BoxInst box-supervised mask losses: torch oracles + train-step smoke.

Oracle formulas restate the reference's
unicorn/models/condinst/dynamic_mask_head.py:7-47 (compute_project_term /
compute_pairwise_term) and adet's F.unfold-based unfold_wo_center in torch,
then assert the static-shape jax forms in losses/boxinst.py match.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from unicorn_tpu.losses.boxinst import (
    boxes_to_bitmasks,
    boxinst_mask_loss,
    compute_pairwise_term,
    compute_project_term,
    images_color_similarity,
    rgb_to_lab,
    unfold_wo_center,
)


def torch_unfold_wo_center(x, kernel_size, dilation):
    """adet.modeling.condinst.condinst.unfold_wo_center semantics on a
    (N, C, H, W) tensor."""
    pad = dilation * (kernel_size // 2)
    unf = F.unfold(x, kernel_size=kernel_size, padding=pad, dilation=dilation)
    N, C, H, W = x.shape
    unf = unf.reshape(N, C, kernel_size ** 2, H, W)
    mid = kernel_size ** 2 // 2
    return torch.cat([unf[:, :, :mid], unf[:, :, mid + 1:]], dim=2)


def test_unfold_wo_center_oracle():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 9, 11).astype(np.float32)
    for k, d in [(3, 1), (3, 2), (5, 2)]:
        ours = np.asarray(unfold_wo_center(jnp.asarray(x), k, d))
        ref = torch_unfold_wo_center(torch.from_numpy(x)[:, None], k, d)
        ref = ref[:, 0].numpy()  # (N, k*k-1, H, W)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_pairwise_term_oracle():
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 8, 10).astype(np.float32) * 3
    ours = np.asarray(compute_pairwise_term(jnp.asarray(logits), 3, 2))

    t = torch.from_numpy(logits)[:, None]          # (N, 1, H, W)
    log_fg = F.logsigmoid(t)
    log_bg = F.logsigmoid(-t)
    fg_n = torch_unfold_wo_center(log_fg, 3, 2)
    bg_n = torch_unfold_wo_center(log_bg, 3, 2)
    same_fg = log_fg[:, :, None] + fg_n
    same_bg = log_bg[:, :, None] + bg_n
    m = torch.max(same_fg, same_bg)
    log_same = torch.log(torch.exp(same_fg - m) + torch.exp(same_bg - m)) + m
    ref = (-log_same[:, 0]).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_project_term_oracle():
    rng = np.random.RandomState(2)
    scores = rng.rand(4, 8, 12).astype(np.float32)
    bm = (rng.rand(4, 8, 12) > 0.5).astype(np.float32)
    ours = np.asarray(compute_project_term(jnp.asarray(scores),
                                           jnp.asarray(bm)))

    def dice(x, tg):
        eps = 1e-5
        x = x.reshape(x.shape[0], -1)
        tg = tg.reshape(tg.shape[0], -1)
        inter = (x * tg).sum(1)
        union = (x ** 2).sum(1) + (tg ** 2).sum(1) + eps
        return 1.0 - 2 * inter / union

    s, b = torch.from_numpy(scores), torch.from_numpy(bm)
    ly = dice(s.max(dim=1)[0], b.max(dim=1)[0])
    lx = dice(s.max(dim=2)[0], b.max(dim=2)[0])
    # reference sums x and y (dynamic_mask_head.py:16), instance mean later
    np.testing.assert_allclose(ours, (lx + ly).numpy(), atol=1e-5)


def test_rgb_to_lab_landmarks():
    """D65 landmark values: white -> (100, 0, 0); pure red's well-known LAB."""
    lab = np.asarray(rgb_to_lab(jnp.asarray(
        np.array([[255.0, 255.0, 255.0], [255.0, 0.0, 0.0],
                  [0.0, 0.0, 0.0]], np.float32))))
    np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.2)
    np.testing.assert_allclose(lab[1], [53.24, 80.09, 67.20], atol=0.5)
    np.testing.assert_allclose(lab[2], [0.0, 0.0, 0.0], atol=0.2)


def test_color_similarity_range_and_identity():
    rng = np.random.RandomState(3)
    img = rng.rand(10, 12, 3).astype(np.float32) * 255
    sim = np.asarray(images_color_similarity(rgb_to_lab(jnp.asarray(img))))
    assert sim.shape == (8, 10, 12)
    # large LAB distances (and borders vs zero padding) underflow exp to 0;
    # the similarity just has to stay a valid weight in [0, 1]
    assert (sim >= 0).all() and (sim <= 1.0 + 1e-6).all()
    # a constant image is maximally similar everywhere (interior pixels)
    flat = np.asarray(images_color_similarity(
        rgb_to_lab(jnp.full((8, 8, 3), 128.0))))
    assert flat[:, 2:-2, 2:-2].min() > 0.999


def test_boxes_to_bitmasks():
    boxes = jnp.asarray([[16.0, 8.0, 16.0, 8.0], [0, 0, 0, 0]], jnp.float32)
    valid = jnp.asarray([1.0, 0.0])
    bm = np.asarray(boxes_to_bitmasks(boxes, valid, 8, 16, 2.0))
    assert bm.shape == (2, 8, 16)
    assert bm[1].sum() == 0
    # box [8,4,24,12] px / stride 2 -> cols 4..11, rows 2..5 inclusive centers
    assert bm[0, 3, 6] == 1 and bm[0, 0, 6] == 0 and bm[0, 3, 14] == 0
    ys, xs = np.nonzero(bm[0])
    assert ys.min() == 2 and ys.max() == 5 and xs.min() == 4 and xs.max() == 11


def test_boxinst_train_step():
    """det_mask step with boxinst=True: finite losses, masks unused, the
    pairwise term warms up with state.step."""
    from unicorn_tpu.core.train_state import TrainState, make_optimizer
    from unicorn_tpu.core.train_step import make_det_mask_train_step
    from unicorn_tpu.models.unicorn import YOLOXDet

    H = W = 64
    model = YOLOXDet(num_classes=5, backbone_name="csp_darknet", depth=0.33,
                     width=0.25, in_channels=(256, 512, 1024),
                     use_attention=False, n_layer_att=0, use_mask=True)
    B, Mi, d_rate = 1, 6, 4
    # gently varying image: neighbors are color-similar, so the pairwise
    # weight (sim >= 0.3 inside the box) has support regardless of the
    # BGR/RGB interpretation (losses treat pipeline images as BGR)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    images = jnp.asarray(np.stack(
        [100 + yy * 0.2, 80 + xx * 0.1, 120 + (yy + xx) * 0.05],
        axis=-1)[None].clip(0, 255))
    labels = np.zeros((B, Mi, 5), np.float32)
    labels[0, 0] = [1, 30, 30, 20, 20]
    labels[0, 1] = [3, 45, 40, 16, 16]
    masks = np.zeros((B, Mi, H // d_rate, W // d_rate), np.float32)  # ignored

    params = model.init(jax.random.PRNGKey(0), images)
    tx = make_optimizer(lambda s: 1e-4, kind="sgd")
    state = TrainState.create(params, tx, use_ema=False)
    step = make_det_mask_train_step(model, (H, W), donate=False,
                                    boxinst=True, boxinst_warmup_iters=2)
    state2, ld = step(state, images, jnp.asarray(labels), jnp.asarray(masks))
    assert np.isfinite(float(ld["total_loss"]))
    assert float(ld["boxinst_prj_loss"]) > 0
    assert "boxinst_pairwise_loss" in ld
    # step 0: warmup factor 0 -> pairwise contributes nothing yet
    assert float(ld["boxinst_pairwise_loss"]) == 0.0
    state3, ld2 = step(state2, images, jnp.asarray(labels),
                       jnp.asarray(masks))
    assert float(ld2["boxinst_pairwise_loss"]) > 0  # warmup 1/2
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(state3.params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
