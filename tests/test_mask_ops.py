"""CondInst dynamic-conv ops vs torch oracles (grouped conv, unfold,
align_corners interpolate) — the dual-implementation test pattern."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from unicorn_tpu.ops.dynamic_conv import (
    NUM_GEN_PARAMS,
    aligned_bilinear,
    compute_locations,
    convex_upsample,
    dynamic_mask_logits,
    parse_dynamic_params,
    resize_align_corners,
)


def torch_dynamic_mask(mask_feats_hwc, params, locs, lvls, stride=8):
    """Oracle: grouped-conv formulation (dynamic_mask_head.py:138-285)."""
    H, W, C = mask_feats_hwc.shape
    N = params.shape[0]
    soi = torch.tensor([64, 128, 256, 512, 1024], dtype=torch.float32)
    locations = torch.from_numpy(np.asarray(compute_locations(H, W, stride)))
    rel = torch.from_numpy(locs).reshape(-1, 1, 2) - locations.reshape(1, -1, 2)
    rel = rel.permute(0, 2, 1).float() / soi[torch.from_numpy(lvls)].reshape(-1, 1, 1)
    mf = torch.from_numpy(mask_feats_hwc).permute(2, 0, 1).reshape(1, C, H * W)
    inputs = torch.cat([rel, mf.expand(N, C, H * W)], dim=1).reshape(1, -1, H, W)

    p = torch.from_numpy(params)
    w_sizes = [(C + 2) * 8, 8 * 8, 8]
    b_sizes = [8, 8, 1]
    splits = list(torch.split_with_sizes(p, w_sizes + b_sizes, dim=1))
    w0 = splits[0].reshape(N * 8, C + 2, 1, 1)
    w1 = splits[1].reshape(N * 8, 8, 1, 1)
    w2 = splits[2].reshape(N * 1, 8, 1, 1)
    b0 = splits[3].reshape(N * 8)
    b1 = splits[4].reshape(N * 8)
    b2 = splits[5].reshape(N)
    x = F.relu(F.conv2d(inputs, w0, b0, groups=N))
    x = F.relu(F.conv2d(x, w1, b1, groups=N))
    x = F.conv2d(x, w2, b2, groups=N)
    return x.reshape(N, H, W).numpy()


def test_dynamic_mask_logits_vs_torch():
    rng = np.random.RandomState(0)
    H, W, C, N = 10, 12, 8, 5
    mf = rng.randn(H, W, C).astype(np.float32)
    params = rng.randn(N, NUM_GEN_PARAMS).astype(np.float32) * 0.3
    locs = rng.uniform(0, 80, (N, 2)).astype(np.float32)
    lvls = rng.randint(0, 3, (N,)).astype(np.int32)
    out = dynamic_mask_logits(jnp.asarray(mf), jnp.asarray(params),
                              jnp.asarray(locs), jnp.asarray(lvls))
    ref = torch_dynamic_mask(mf, params, locs, lvls)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_resize_align_corners_vs_torch():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 7, 9, 3).astype(np.float32)
    out = resize_align_corners(jnp.asarray(x), 13, 17)
    ref = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=(13, 17),
                        mode="bilinear", align_corners=True)
    np.testing.assert_allclose(np.asarray(out),
                               ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-5)


def torch_aligned_bilinear(t, factor):
    """comm.py:5-27 oracle."""
    h, w = t.shape[2:]
    t = F.pad(t, pad=(0, 1, 0, 1), mode="replicate")
    oh, ow = factor * h + 1, factor * w + 1
    t = F.interpolate(t, size=(oh, ow), mode="bilinear", align_corners=True)
    t = F.pad(t, pad=(factor // 2, 0, factor // 2, 0), mode="replicate")
    return t[:, :, : oh - 1, : ow - 1]


def test_aligned_bilinear_vs_torch():
    rng = np.random.RandomState(1)
    x = rng.randn(3, 6, 8).astype(np.float32)
    out = aligned_bilinear(jnp.asarray(x), 4)
    ref = torch_aligned_bilinear(torch.from_numpy(x)[:, None], 4)[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_convex_upsample_vs_torch():
    rng = np.random.RandomState(2)
    N, H, W, R = 3, 5, 6, 8
    pred = rng.randn(N, H, W).astype(np.float32)
    up_mask_hwc = rng.randn(H, W, 9 * R * R).astype(np.float32)
    out = convex_upsample(jnp.asarray(pred), jnp.asarray(up_mask_hwc), R)

    # torch oracle (dynamic_mask_head.py:159-170)
    mask = torch.from_numpy(up_mask_hwc).permute(2, 0, 1)[None]  # (1, C, H, W)
    mask = mask.view(1, 1, 9, R, R, H, W)
    mask = torch.softmax(mask, dim=2)
    up_pred = F.unfold(torch.from_numpy(pred)[:, None], [3, 3], padding=1)
    up_pred = up_pred.view(N, 1, 9, 1, 1, H, W)
    ref = torch.sum(mask * up_pred, dim=2)
    ref = ref.permute(0, 1, 4, 2, 5, 3).reshape(N, 1, R * H, R * W)[:, 0].numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_mask_loss_runs():
    from unicorn_tpu.losses.mask import condinst_mask_loss

    rng = np.random.RandomState(0)
    B, M = 2, 10
    hw = [(8, 8), (4, 4), (2, 2)]
    A = sum(h * w for h, w in hw)
    ctrl = jnp.asarray(rng.randn(B, A, NUM_GEN_PARAMS).astype(np.float32) * 0.1)
    mf = jnp.asarray(rng.randn(B, 8, 8, 8).astype(np.float32))
    fg = np.zeros((B, A), bool)
    fg[:, :5] = True
    mgt = np.zeros((B, A), np.int32)
    piou = rng.rand(B, A).astype(np.float32)
    gtm = (rng.rand(B, M, 16, 16) > 0.5).astype(np.float32)

    def loss_fn(ctrl):
        return condinst_mask_loss(
            ctrl, mf, jnp.asarray(fg), jnp.asarray(mgt), jnp.asarray(piou),
            jnp.asarray(gtm), hw, (8, 16, 32), max_inst=8,
        )

    loss, grad = jax.value_and_grad(loss_fn)(ctrl)
    assert np.isfinite(float(loss)) and 0 <= float(loss) <= 1.0
    assert np.all(np.isfinite(np.asarray(grad)))
    assert float(jnp.abs(grad).sum()) > 0
