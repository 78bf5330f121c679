"""Whole-network numerical parity vs the reference PyTorch Unicorn.

Builds the reference unicorn_track_tiny model (convnext_tiny + deformable
interaction, GN-converted) on torch-cpu with its pure-torch MSDA
(unicorn/models/ops/functions/ms_deform_attn_func.py:41-62), converts its
state_dict through tools/convert_torch_weights.py, and asserts staged
allclose: backbone/FPN -> pos-emb -> interaction -> upsample -> head (MOT and
SOT modes, with prior fusion). This turns "parity by construction" into
"parity by measurement": any drift in layer semantics or the converter fails
here. (VERDICT r1 item 2.)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

try:
    from torch_ref import build_reference_tiny
except ImportError:  # helper not on path (direct file invocation)
    from tests.torch_ref import build_reference_tiny

import jax
import jax.numpy as jnp
import scipy.special as ss

from tools.convert_torch_weights import convert_state_dict, insert_into_tree
from unicorn_tpu.models.heads import flatten_raw_outputs
from unicorn_tpu.models.unicorn import Unicorn

H, W = 96, 160
STRIDES = (8, 16, 32)
ATOL = 1e-4   # observed staged diffs are <= ~2e-5 at ref |max| ~4 (fp32 noise)


@pytest.fixture(scope="module")
def pair():
    """(torch model, flax model, converted params, np images)."""
    try:
        tm = build_reference_tiny(num_classes=8, seed=0)
    except ImportError as e:
        pytest.skip(f"reference tree unavailable: {e}")
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jm = Unicorn(num_classes=8, backbone_name="convnext_tiny",
                 in_channels=(192, 384, 768), interact_mode="deform",
                 n_layer_att=3)
    rng = np.random.RandomState(0)
    imgs = (rng.rand(2, H, W, 3) * 255).astype(np.float32)
    params = jm.init(jax.random.PRNGKey(0), jnp.asarray(imgs[:1]),
                     method=Unicorn.init_all)

    mapped, missed = convert_state_dict(sd, depth=1.0)
    assert not missed, f"unmapped torch keys: {missed[:10]}"
    params["params"], n_ok, mism = insert_into_tree(params["params"], mapped)
    assert not mism, f"placement issues: {mism[:10]}"
    assert n_ok == len(sd)
    # every flax leaf must be covered (converter is a bijection)
    flat = jax.tree_util.tree_leaves_with_path(params["params"])
    paths = {"/".join(str(p.key) for p in path) for path, _ in flat}
    uncovered = paths - set(mapped)
    assert not uncovered, f"flax leaves not covered: {sorted(uncovered)[:10]}"
    return tm, jm, params, imgs


def _nhwc(t):
    return t.detach().numpy().transpose(0, 2, 3, 1)


def test_staged_forward_parity(pair):
    tm, jm, params, imgs = pair
    tx = [torch.from_numpy(im.transpose(2, 0, 1)[None].copy()) for im in imgs]

    with torch.no_grad():
        t_fpn0, t_seq0 = tm.forward_backbone(tx[0])
        _, t_seq1 = tm.forward_backbone(tx[1])

    j_fpn0, j_f16_0 = jm.apply(params, jnp.asarray(imgs[:1]),
                               method=Unicorn.forward_backbone)
    _, j_f16_1 = jm.apply(params, jnp.asarray(imgs[1:]),
                          method=Unicorn.forward_backbone)

    # backbone + FPN
    for i, (tf, jf) in enumerate(zip(t_fpn0, j_fpn0)):
        np.testing.assert_allclose(np.asarray(jf), _nhwc(tf),
                                   atol=ATOL, rtol=1e-3,
                                   err_msg=f"fpn level {i}")
    np.testing.assert_allclose(np.asarray(j_f16_0), _nhwc(t_seq0["feat"]),
                               atol=ATOL, rtol=1e-3, err_msg="feat_s16")

    # learned positional embedding (row/col embed + bilinear resize)
    j_pos = jm.apply(params, 1, H // 16, W // 16,
                     method=lambda m, b, h, w: m.pos_emb(b, h, w))
    np.testing.assert_allclose(np.asarray(j_pos), _nhwc(t_seq0["pos"]),
                               atol=ATOL, rtol=1e-3, err_msg="pos_emb")

    # deformable interaction (XLA gather vs reference grid_sample MSDA)
    with torch.no_grad():
        t_new0, t_new1 = tm.forward_deform_interact(t_seq0, t_seq1)
    j_new0, j_new1 = jm.apply(params, j_f16_0, j_f16_1,
                              method=Unicorn.forward_interaction)
    np.testing.assert_allclose(np.asarray(j_new0), _nhwc(t_new0),
                               atol=ATOL, rtol=1e-3, err_msg="interact frame0")
    np.testing.assert_allclose(np.asarray(j_new1), _nhwc(t_new1),
                               atol=ATOL, rtol=1e-3, err_msg="interact frame1")

    # upsample to the stride-8 embedding map (PixelShuffle path)
    with torch.no_grad():
        t_emb = tm.forward_upsample(t_new0)
    j_emb = jm.apply(params, j_new0, method=Unicorn.forward_upsample)
    np.testing.assert_allclose(np.asarray(j_emb), _nhwc(t_emb),
                               atol=ATOL, rtol=1e-3, err_msg="embedding")

    # head: MOT (zero prior) and SOT (random prior pyramid, fused via beta)
    tm.head.decode_in_inference = False
    rng = np.random.RandomState(7)
    priors = [rng.rand(1, 1, H // s, W // s).astype(np.float32)
              for s in STRIDES]
    with torch.no_grad():
        t_mot = tm.head(t_fpn0, [torch.zeros(1, 1, H // s, W // s)
                                 for s in STRIDES], mode="mot").numpy()
        t_sot = tm.head(t_fpn0, [torch.from_numpy(p) for p in priors],
                        mode="sot").numpy()

    j_zero = tuple(jnp.zeros((1, H // s, W // s, 1)) for s in STRIDES)
    j_rand = tuple(jnp.asarray(p.transpose(0, 2, 3, 1)) for p in priors)
    for mode, t_out, pri in (("mot", t_mot, j_zero), ("sot", t_sot, j_rand)):
        raw = jm.apply(params, j_fpn0, pri, method=Unicorn.forward_head)
        fl = flatten_raw_outputs(raw, mode)
        j_out = np.concatenate([
            np.asarray(fl["reg_raw"]),
            ss.expit(np.asarray(fl["obj_logits"])),
            ss.expit(np.asarray(fl["cls_logits"])),
        ], axis=-1)
        assert j_out.shape == t_out.shape
        np.testing.assert_allclose(j_out, t_out, atol=ATOL, rtol=1e-3,
                                   err_msg=f"head {mode}")


def test_training_loss_parity(pair):
    """Training glue parity: the reference head's get_losses (SimOTA
    assignment + IoU/BCE/L1 weighting/normalization) vs yolox_losses on the
    same converted weights, features, and labels (well-separated boxes so the
    discrete dynamic-k matching is numerically stable)."""
    from unicorn_tpu.losses.det import yolox_losses
    from unicorn_tpu.models.heads import decode_boxes, level_grids

    tm, jm, params, imgs = pair
    tx0 = torch.from_numpy(imgs[0].transpose(2, 0, 1)[None].copy())
    with torch.no_grad():
        t_fpn, _ = tm.forward_backbone(tx0)

    # two well-separated gt boxes [cls, cx, cy, w, h]
    labels = np.zeros((1, 10, 5), np.float32)
    labels[0, 0] = [2, 40.0, 30.0, 36.0, 28.0]
    labels[0, 1] = [5, 120.0, 64.0, 40.0, 44.0]

    tm.head.train()
    tm.head.use_l1 = True
    zero_masks = [torch.zeros(1, 1, H // s, W // s) for s in STRIDES]
    t_loss = tm.head(t_fpn, zero_masks, labels=torch.from_numpy(labels),
                     imgs=tx0, mode="mot")
    tm.head.eval()
    tm.head.use_l1 = False

    j_fpn0, _ = jm.apply(params, jnp.asarray(imgs[:1]),
                         method=Unicorn.forward_backbone)
    j_zero = tuple(jnp.zeros((1, H // s, W // s, 1)) for s in STRIDES)
    raw = jm.apply(params, j_fpn0, j_zero, method=Unicorn.forward_head)
    fl = flatten_raw_outputs(raw, "mot")
    pred_boxes = decode_boxes(fl["reg_raw"], fl["hw"], STRIDES)
    xs, ys, sv = level_grids(fl["hw"], STRIDES)
    j_loss, _ = yolox_losses(
        jnp.asarray(labels), pred_boxes, fl["obj_logits"], fl["cls_logits"],
        fl["reg_raw"], xs, ys, sv, (H, W), use_l1=True)

    # reference returns a loss_dict in training mode (unicorn_head.py:395)
    t_total = float(t_loss["total_loss"])
    t_iou = float(t_loss["iou_loss"])
    t_conf = float(t_loss["conf_loss"])
    t_cls = float(t_loss["cls_loss"])
    t_l1 = float(t_loss["l1_loss"])
    t_nfg = float(t_loss["num_fg"])
    assert float(j_loss["num_fg"]) == pytest.approx(t_nfg, rel=1e-6), \
        "SimOTA foreground counts diverge"
    for name, tv in (("iou_loss", t_iou), ("conf_loss", t_conf),
                     ("cls_loss", t_cls), ("l1_loss", t_l1),
                     ("total_loss", t_total)):
        assert float(j_loss[name]) == pytest.approx(tv, rel=2e-3), name


def test_mask_head_parity():
    """Whole-network parity for the MASK stage: reference UnicornHeadMask
    (controllers from the reg tower, CondInst mask branch, RAFT up-mask at
    up_rate=4) vs our with_mask head + MaskBranch on converted weights."""
    try:
        tm = build_reference_tiny(num_classes=8, seed=0, with_mask=True)
    except ImportError as e:
        pytest.skip(f"reference tree unavailable: {e}")
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    jm = Unicorn(num_classes=8, backbone_name="convnext_tiny",
                 in_channels=(192, 384, 768), interact_mode="deform",
                 n_layer_att=3, use_mask=True, use_raft=True, up_rate=4)
    rng = np.random.RandomState(0)
    imgs = (rng.rand(1, H, W, 3) * 255).astype(np.float32)
    params = jm.init(jax.random.PRNGKey(0), jnp.asarray(imgs),
                     method=Unicorn.init_all)
    mapped, missed = convert_state_dict(sd, depth=1.0)
    assert not missed, f"unmapped torch keys: {missed[:10]}"
    params["params"], n_ok, mism = insert_into_tree(params["params"], mapped)
    assert not mism, f"placement issues: {mism[:10]}"

    tx = torch.from_numpy(imgs[0].transpose(2, 0, 1)[None].copy())
    with torch.no_grad():
        t_fpn, _ = tm.forward_backbone(tx)
        zero_masks = [torch.zeros(1, 1, H // s, W // s) for s in STRIDES]
        t_out, t_locs, t_ctrl, t_lvls, t_mfeats, t_up = tm.head(
            t_fpn, zero_masks, mode="mot")

    j_fpn, _ = jm.apply(params, jnp.asarray(imgs),
                        method=Unicorn.forward_backbone)
    priors = tuple(jnp.zeros(f.shape[:3] + (1,), f.dtype) for f in j_fpn)
    raw = jm.apply(params, j_fpn, priors, method=Unicorn.forward_head)
    flat = flatten_raw_outputs(raw, "mot")
    j_mfeats, j_up, _sem = jm.apply(params, j_fpn,
                                    method=Unicorn.forward_mask_branch)

    # CondInst controller params per anchor (169 each, reg-tower sourced)
    np.testing.assert_allclose(np.asarray(flat["ctrl"]),
                               t_ctrl.numpy(), atol=ATOL, rtol=1e-3,
                               err_msg="controllers")
    # anchor locations / fpn levels
    from unicorn_tpu.models.mask_head import anchor_locations_and_levels

    j_locs, j_lvls = anchor_locations_and_levels(flat["hw"], STRIDES)
    np.testing.assert_allclose(np.asarray(j_locs), t_locs.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_lvls), t_lvls[0].numpy(),
                               atol=0)
    # mask features + RAFT up-mask (NCHW -> NHWC)
    np.testing.assert_allclose(np.asarray(j_mfeats), _nhwc(t_mfeats),
                               atol=ATOL, rtol=1e-3, err_msg="mask_feats")
    np.testing.assert_allclose(np.asarray(j_up), _nhwc(t_up),
                               atol=ATOL, rtol=1e-3, err_msg="up_mask")
    # decoded det outputs (reference eval path decodes + sigmoids)
    from unicorn_tpu.models.heads import decode_for_inference

    j_dec = decode_for_inference(raw, STRIDES, mode="mot")
    np.testing.assert_allclose(np.asarray(j_dec), t_out.numpy(),
                               atol=2e-4, rtol=1e-3, err_msg="decoded dets")


def test_training_grad_parity(pair):
    """BACKWARD parity: d(total_loss)/d(FPN features) through head + SimOTA
    losses must match torch autograd on the converted weights. This pins the
    assignment's no_grad semantics (reference unicorn_head.py:690
    @torch.no_grad() vs the stop_gradient in losses/det.py:simota_assign) —
    without the stop, grad leaks into the pairwise-IoU tower via the BCE
    target derivative and this test fails."""
    from unicorn_tpu.losses.det import yolox_losses
    from unicorn_tpu.models.heads import decode_boxes, level_grids

    tm, jm, params, imgs = pair
    tx0 = torch.from_numpy(imgs[0].transpose(2, 0, 1)[None].copy())
    with torch.no_grad():
        t_fpn, _ = tm.forward_backbone(tx0)
    t_fpn = [t.detach().clone().requires_grad_(True) for t in t_fpn]

    labels = np.zeros((1, 10, 5), np.float32)
    labels[0, 0] = [2, 40.0, 30.0, 36.0, 28.0]
    labels[0, 1] = [5, 120.0, 64.0, 40.0, 44.0]

    tm.head.train()
    tm.head.use_l1 = True
    zero_masks = [torch.zeros(1, 1, H // s, W // s) for s in STRIDES]
    t_loss = tm.head(t_fpn, zero_masks, labels=torch.from_numpy(labels),
                     imgs=tx0, mode="mot")
    t_loss["total_loss"].backward()
    t_grads = [t.grad.numpy() for t in t_fpn]
    tm.head.eval()
    tm.head.use_l1 = False

    j_fpn0, _ = jm.apply(params, jnp.asarray(imgs[:1]),
                         method=Unicorn.forward_backbone)
    j_zero = tuple(jnp.zeros((1, H // s, W // s, 1)) for s in STRIDES)

    def jloss(fpn):
        raw = jm.apply(params, fpn, j_zero, method=Unicorn.forward_head)
        fl = flatten_raw_outputs(raw, "mot")
        pred_boxes = decode_boxes(fl["reg_raw"], fl["hw"], STRIDES)
        xs, ys, sv = level_grids(fl["hw"], STRIDES)
        ld, _ = yolox_losses(
            jnp.asarray(labels), pred_boxes, fl["obj_logits"],
            fl["cls_logits"], fl["reg_raw"], xs, ys, sv, (H, W), use_l1=True)
        return ld["total_loss"]

    j_grads = jax.grad(jloss)(j_fpn0)
    for lvl, (jg, tg) in enumerate(zip(j_grads, t_grads)):
        jg = np.asarray(jg).transpose(0, 3, 1, 2)
        scale = np.abs(tg).max()
        np.testing.assert_allclose(
            jg, tg, rtol=5e-3, atol=2e-3 * scale,
            err_msg=f"FPN level {lvl} input grads")
