"""Shape/smoke tests for backbones, PAFPN, head, decode, and SimOTA losses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unicorn_tpu.models.csp_darknet import CSPDarknet
from unicorn_tpu.models.pafpn import YOLOPAFPN
from unicorn_tpu.models.heads import (
    UnicornHead, decode_for_inference, flatten_raw_outputs, decode_boxes,
)
from unicorn_tpu.losses.det import yolox_losses, simota_assign, iou_pairwise_cxcywh

H, W = 128, 128


def test_csp_darknet_shapes():
    model = CSPDarknet(dep_mul=0.33, wid_mul=0.5)
    x = jnp.zeros((1, H, W, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    c3, c4, c5 = model.apply(params, x)
    assert c3.shape == (1, H // 8, W // 8, 128)
    assert c4.shape == (1, H // 16, W // 16, 256)
    assert c5.shape == (1, H // 32, W // 32, 512)


def test_pafpn_head_decode():
    fpn = YOLOPAFPN(depth=0.33, width=0.5, in_channels=(256, 512, 1024),
                    backbone_name="csp_darknet")
    head = UnicornHead(num_classes=8, width=0.5, in_channels=(256, 512, 1024),
                       sot_branch=True, n_layer_att=1)
    x = jnp.zeros((2, H, W, 3))
    fpn_params = fpn.init(jax.random.PRNGKey(0), x)
    feats = fpn.apply(fpn_params, x)
    assert feats[0].shape == (2, H // 8, W // 8, 128)

    priors = tuple(
        jnp.zeros((2, H // s, W // s, 1)) for s in (8, 16, 32)
    )
    head_params = head.init(jax.random.PRNGKey(1), feats, priors)
    outs = head.apply(head_params, feats, priors)
    assert len(outs) == 3
    assert outs[0]["cls"].shape == (2, H // 8, W // 8, 8)
    assert outs[0]["cls_sot"].shape == (2, H // 8, W // 8, 1)

    dec = decode_for_inference(outs, (8, 16, 32), mode="mot")
    A = (H // 8) * (W // 8) + (H // 16) * (W // 16) + (H // 32) * (W // 32)
    assert dec.shape == (2, A, 5 + 8)
    # obj/cls scores are sigmoided
    assert float(dec[..., 4:].min()) >= 0.0 and float(dec[..., 4:].max()) <= 1.0


def test_simota_basic():
    """A gt box centered on the grid should get assigned at least 1 anchor."""
    A_list = [(H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32)]
    from unicorn_tpu.models.heads import level_grids
    xs, ys, ss = level_grids(A_list, (8, 16, 32))
    A = xs.shape[0]
    M = 10
    rng = np.random.RandomState(0)

    gt_boxes = np.zeros((M, 4), np.float32)
    gt_boxes[0] = [64, 64, 40, 40]
    gt_boxes[1] = [30, 90, 20, 30]
    gt_valid = np.zeros((M,), bool)
    gt_valid[:2] = True
    gt_classes = np.array([1, 3] + [0] * 8, np.int32)

    pred_boxes = np.tile(np.array([[64, 64, 30, 30]], np.float32), (A, 1))
    pred_boxes += rng.uniform(-2, 2, pred_boxes.shape).astype(np.float32)
    obj_logits = rng.randn(A, 1).astype(np.float32)
    cls_logits = rng.randn(A, 8).astype(np.float32)

    res = simota_assign(
        jnp.asarray(gt_boxes), jnp.asarray(gt_classes), jnp.asarray(gt_valid),
        jnp.asarray(pred_boxes), jnp.asarray(obj_logits), jnp.asarray(cls_logits),
        xs, ys, ss, (H, W),
    )
    assert float(res.num_fg) >= 2.0
    assert float(res.num_gt) == 2.0
    # every assigned anchor maps to a valid gt
    matched = np.asarray(res.matched_gt)[np.asarray(res.fg_mask)]
    assert set(matched.tolist()) <= {0, 1}
    # gt 0 overlaps predictions, so at least one fg anchor has positive IoU;
    # gt 1 has zero IoU with every pred and still gets its forced min-1
    # assignment (reference clamps dynamic_k to >= 1) with pred_iou == 0.
    assert float(jnp.max(res.pred_iou)) > 0.0
    assert float(jnp.min(res.pred_iou[res.fg_mask])) >= 0.0


def test_yolox_losses_grad():
    A_list = [(H // 8, W // 8), (H // 16, W // 16), (H // 32, W // 32)]
    from unicorn_tpu.models.heads import level_grids
    xs, ys, ss = level_grids(A_list, (8, 16, 32))
    A = xs.shape[0]
    B, M, C = 2, 10, 8
    rng = np.random.RandomState(0)

    labels = np.zeros((B, M, 5), np.float32)
    labels[0, 0] = [1, 64, 64, 40, 40]
    labels[1, 0] = [2, 30, 90, 20, 30]
    labels[1, 1] = [0, 100, 40, 24, 24]

    reg_raw = jnp.asarray(rng.randn(B, A, 4).astype(np.float32) * 0.1)
    obj_logits = jnp.asarray(rng.randn(B, A, 1).astype(np.float32))
    cls_logits = jnp.asarray(rng.randn(B, A, C).astype(np.float32))
    pred_boxes = decode_boxes(reg_raw, A_list, (8, 16, 32))

    def loss_fn(reg_raw, obj_logits, cls_logits):
        pred_boxes = decode_boxes(reg_raw, A_list, (8, 16, 32))
        ld, _ = yolox_losses(
            jnp.asarray(labels), pred_boxes, obj_logits, cls_logits, reg_raw,
            xs, ys, ss, (H, W), use_l1=True,
        )
        return ld["total_loss"]

    loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
        reg_raw, obj_logits, cls_logits
    )
    assert np.isfinite(float(loss))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(grads[0]).sum()) > 0.0


def test_mhs_labels_and_loss():
    """MOT-helps-SOT: synthetic labels pick the first matched pair; the aux
    loss is finite and contributes gradients on MOT samples."""
    import numpy as np

    from unicorn_tpu.losses.uni import build_mhs_labels

    targets = np.zeros((2, 2, 6, 6), np.float32)
    # sample 0: matched tids (7 at rows 1/0)
    targets[0, 0, 1] = [1, 40, 40, 20, 20, 7]
    targets[0, 1, 0] = [1, 44, 42, 20, 20, 7]
    # sample 1: no matches
    targets[1, 0, 0] = [0, 30, 30, 10, 10, 3]
    targets[1, 1, 0] = [0, 33, 30, 10, 10, 9]
    mhs_t, has = build_mhs_labels(jnp.asarray(targets))
    assert bool(has[0]) and not bool(has[1])
    np.testing.assert_allclose(np.asarray(mhs_t)[0, 0, 0, 1:6],
                               targets[0, 0, 1, 1:6])
    np.testing.assert_allclose(np.asarray(mhs_t)[0, 1, 0, 1:6],
                               targets[0, 1, 0, 1:6])
    assert np.asarray(mhs_t)[1].sum() == 0


def test_uni_loss_with_mhs_runs():
    from unicorn_tpu.core.train_step import uni_loss_fn
    from unicorn_tpu.models.unicorn import Unicorn

    model = Unicorn(num_classes=8, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    rng = np.random.RandomState(0)
    Hh = Ww = 64
    images = jnp.asarray(rng.rand(1, 2, Hh, Ww, 3).astype(np.float32) * 255)
    targets = np.zeros((1, 2, 5, 6), np.float32)
    targets[0, 0, 0] = [1, 30, 30, 20, 20, 5]
    targets[0, 1, 0] = [1, 33, 32, 20, 20, 5]
    params = model.init(jax.random.PRNGKey(0), images[:1, 0],
                        method=Unicorn.init_all)
    total, ld = uni_loss_fn(model, params, images, jnp.asarray(targets),
                            jnp.asarray([2], jnp.int32), (Hh, Ww), mhs=True)
    assert np.isfinite(float(total))
    assert "mhs_loss" in ld and np.isfinite(float(ld["mhs_loss"]))
    assert float(ld["mhs_loss"]) > 0


def test_head_prior_fusion_modes():
    """Prior fusion semantics (unicorn_head.py:271-281): 'sum' adds m*beta
    (beta init 1 -> x+m), 'mul' computes x*m + x; zero prior is a no-op in
    both modes (the basis for single-head-call mixed-task batches)."""
    feats = tuple(jnp.ones((1, H // s, W // s, 128)) for s in (8, 16, 32))
    zero_p = tuple(jnp.zeros((1, H // s, W // s, 1)) for s in (8, 16, 32))
    one_p = tuple(jnp.ones((1, H // s, W // s, 1)) for s in (8, 16, 32))

    for fuse in ("sum", "mul"):
        head = UnicornHead(num_classes=2, width=0.5,
                           in_channels=(256, 512, 1024), sot_branch=False,
                           use_attention=False, n_layer_att=0,
                           fuse_method=fuse, learnable_fuse=(fuse == "sum"))
        params = head.init(jax.random.PRNGKey(0), feats, zero_p)
        out_zero = head.apply(params, feats, zero_p)
        out_none = head.apply(params, feats, None)
        np.testing.assert_allclose(np.asarray(out_zero[0]["reg"]),
                                   np.asarray(out_none[0]["reg"]), atol=1e-6)
        out_one = head.apply(params, feats, one_p)
        diff = np.abs(np.asarray(out_one[0]["reg"])
                      - np.asarray(out_zero[0]["reg"])).max()
        # magnitude depends on init-scale towers; just require a real effect
        assert diff > 1e-6, f"prior had no effect under {fuse}"


def test_remat_backbone_identical_loss_and_grads():
    """remat=True (reference convnext.py use_checkpoint role) must be a pure
    memory knob: identical params tree, loss, and gradients."""
    import jax

    from unicorn_tpu.models.convnext import ConvNeXt

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 64, 96, 3), jnp.float32)
    models = {
        r: ConvNeXt(depths=(1, 1, 2, 1), dims=(16, 32, 48, 64), remat=r)
        for r in (False, True, "dw")
    }
    params = models[False].init(jax.random.PRNGKey(0), imgs)
    for r in (True, "dw"):
        pr = models[r].init(jax.random.PRNGKey(0), imgs)
        assert jax.tree_util.tree_structure(params) == \
            jax.tree_util.tree_structure(pr)

    outs = {}
    for r, model in models.items():
        loss = lambda p: sum(jnp.sum(o * o) for o in model.apply(p, imgs))
        outs[r] = jax.value_and_grad(loss)(params)
    for r in (True, "dw"):
        np.testing.assert_allclose(outs[False][0], outs[r][0], rtol=1e-6)
        for ga, gb in zip(jax.tree_util.tree_leaves(outs[False][1]),
                          jax.tree_util.tree_leaves(outs[r][1])):
            np.testing.assert_allclose(ga, gb, rtol=1e-5, atol=1e-6)


def test_remat_swin_identical_loss():
    """Swin remat (reference swin use_checkpoint role): same params tree and
    loss; grads equal up to fp32 reassociation noise."""
    import jax

    from unicorn_tpu.models.swin import SwinTransformer

    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3), jnp.float32)
    models = {r: SwinTransformer(embed_dim=24, depths=(1, 1, 2, 1),
                                 num_heads=(2, 2, 2, 2), window_size=4,
                                 remat=r) for r in (False, True)}
    params = models[False].init(jax.random.PRNGKey(0), imgs)
    p2 = models[True].init(jax.random.PRNGKey(0), imgs)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    outs = {}
    for r, m in models.items():
        loss = lambda p: sum(jnp.sum(o * o) for o in m.apply(p, imgs))
        outs[r] = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(outs[False][0], outs[True][0], rtol=1e-6)
    for ga, gb in zip(jax.tree_util.tree_leaves(outs[False][1]),
                      jax.tree_util.tree_leaves(outs[True][1])):
        # fp32 reassociation noise only; a wrong gradient differs at O(grad)
        np.testing.assert_allclose(ga, gb, rtol=5e-2, atol=5e-5)


def test_fast_norms_serving_drift_bounded():
    """set_fast_norms (bf16 norm apply, fp32 stats) must leave fp32 models
    bit-identical and keep bf16 decoded-output drift within the serving
    tolerance already accepted for tanh-GELU (README)."""
    import numpy as np

    from unicorn_tpu.models.blocks import set_fast_norms
    from unicorn_tpu.models.heads import decode_for_inference
    from unicorn_tpu.models.unicorn import Unicorn

    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(1, 64, 96, 3).astype(np.float32) * 255)

    def run(dtype, fast):
        set_fast_norms(fast)
        try:
            m = Unicorn(num_classes=1, backbone_name="convnext_tiny",
                        in_channels=(192, 384, 768), interact_mode="conv",
                        n_layer_att=0, use_attention=False, dtype=dtype)
            p = m.init(jax.random.PRNGKey(0), imgs, method=Unicorn.init_all)
            raw, _ = m.apply(p, imgs, method=Unicorn.forward_whole)
            return np.asarray(decode_for_inference(raw, (8, 16, 32),
                                                   mode="mot"), np.float32)
        finally:
            set_fast_norms(False)

    f32_exact = run(jnp.float32, False)
    f32_fast = run(jnp.float32, True)
    np.testing.assert_array_equal(f32_exact, f32_fast)

    bf_exact = run(jnp.bfloat16, False)
    bf_fast = run(jnp.bfloat16, True)
    # scores (sigmoided) drift
    np.testing.assert_allclose(bf_fast[..., 4:], bf_exact[..., 4:], atol=2e-2)
    # boxes drift bounded relative to the stride-8 cell size
    np.testing.assert_allclose(bf_fast[..., :4], bf_exact[..., :4], atol=1.0)


def test_swin_family_surface():
    """Full Swin family (reference swin_transformer.py:447-661 via
    swin_config.py): tiny/small/base/large constructors exist with the
    standard embed/depth/head configs, and the smallest one runs."""
    import jax
    import jax.numpy as jnp

    from unicorn_tpu.models.swin import (
        SWIN_BUILDERS, SWIN_OUT_CHANNELS, swin_base, swin_large, swin_small,
    )

    cfgs = {
        "swin_tiny": (96, (2, 2, 6, 2), (3, 6, 12, 24)),
        "swin_small": (96, (2, 2, 18, 2), (3, 6, 12, 24)),
        "swin_base": (128, (2, 2, 18, 2), (4, 8, 16, 32)),
        "swin_large": (192, (2, 2, 18, 2), (6, 12, 24, 48)),
    }
    for name, (dim, depths, heads) in cfgs.items():
        m = SWIN_BUILDERS[name]()
        assert (m.embed_dim, tuple(m.depths), tuple(m.num_heads)) == \
            (dim, depths, heads), name
        # stride-8/16/32 channels: 2*dim, 4*dim, 8*dim
        assert SWIN_OUT_CHANNELS[name] == (2 * dim, 4 * dim, 8 * dim)
    assert swin_small().depths == (2, 2, 18, 2)
    assert swin_base().embed_dim == 128
    assert swin_large().num_heads == (6, 12, 24, 48)

    m = SWIN_BUILDERS["swin_tiny"]()
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [(1, 8, 8, 192), (1, 4, 4, 384),
                                       (1, 2, 2, 768)]


def test_uni_forward_embeddings_backbone_map_parity():
    """backbone_map=True (lax.map batch-1 backbone, the train-throughput
    schedule probe) is the same math as the 2B-batch path: embeddings and
    frame-1 FPN outputs agree to fp32 tolerance."""
    from unicorn_tpu.core.train_step import uni_forward_embeddings
    from unicorn_tpu.models.unicorn import Unicorn

    model = Unicorn(num_classes=8, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(2, 2, 64, 96, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), images[:1, 0],
                        method=Unicorn.init_all)
    fpn_a, e0_a, e1_a = uni_forward_embeddings(model, params, images)
    fpn_b, e0_b, e1_b = uni_forward_embeddings(model, params, images,
                                               backbone_map=True)
    np.testing.assert_allclose(np.asarray(e0_a), np.asarray(e0_b),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(e1_a), np.asarray(e1_b),
                               rtol=1e-4, atol=1e-4)
    for xa, xb in zip(fpn_a, fpn_b):
        np.testing.assert_allclose(np.asarray(xa), np.asarray(xb),
                                   rtol=1e-4, atol=1e-4)


def test_uni_loss_sot_only_matches_full():
    """sot_only=True must be a pure compute-skip: with task_ids in {0, 1}
    the MOT branch's sample count is exactly zero, so total_loss and its
    gradients are identical with and without the branch (round-5: the MHS
    pass paid a full SimOTA/MOT-loss computation multiplied by zero)."""
    from unicorn_tpu.core.train_step import uni_forward_embeddings
    from unicorn_tpu.losses.uni import build_sot_priors, unicorn_uni_loss
    from unicorn_tpu.models.unicorn import Unicorn
    from unicorn_tpu.ops.correlation import resize_bilinear_torch

    model = Unicorn(num_classes=8, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    rng = np.random.RandomState(1)
    Hh = Ww = 64
    images = jnp.asarray(rng.rand(2, 2, Hh, Ww, 3).astype(np.float32) * 255)
    targets = np.zeros((2, 2, 4, 6), np.float32)
    targets[0, 0, 0] = [0, 30, 30, 20, 20, 1]
    targets[0, 1, 0] = [0, 33, 32, 20, 20, 1]
    task_ids = jnp.asarray([1, 0], jnp.int32)  # SOT + padded; never MOT
    params = model.init(jax.random.PRNGKey(0), images[:1, 0],
                        method=Unicorn.init_all)
    fpn_outs_1, embed_0, embed_1 = uni_forward_embeddings(
        model, params, images)
    prior, gt1 = build_sot_priors(embed_0, embed_1, jnp.asarray(targets),
                                  (Hh, Ww), task_ids)
    H8, W8 = prior.shape[1:3]
    pyr = (prior, resize_bilinear_torch(prior, H8 // 2, W8 // 2),
           resize_bilinear_torch(prior, H8 // 4, W8 // 4))
    head_raw = model.apply(params, fpn_outs_1, pyr,
                           method=Unicorn.forward_head)

    def total(e0, sot_only):
        return unicorn_uni_loss(
            head_raw, e0, embed_1, prior, gt1, jnp.asarray(targets),
            task_ids, (Hh, Ww), sot_only=sot_only)["total_loss"]

    t_full, g_full = jax.value_and_grad(lambda e: total(e, False))(embed_0)
    t_sot, g_sot = jax.value_and_grad(lambda e: total(e, True))(embed_0)
    np.testing.assert_allclose(float(t_full), float(t_sot), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_full), np.asarray(g_sot),
                               rtol=1e-5, atol=1e-8)
