"""Unified-loss parity vs torch oracles of the reference semantics:
MOT contrastive correlation loss (unicorn.py:409-459) and the SOT label
propagation + dice chain (unicorn.py:315-337)."""
import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from unicorn_tpu.losses.uni import mot_contrastive_loss_single
from unicorn_tpu.ops.correlation import (
    box_label_map,
    correlation_propagate_dense,
    dice_loss,
    resize_bilinear_torch,
)


def torch_mot_corr(embed0, embed1, targets, s=8, bidirect=True):
    """Oracle: reference compute_loss_mot_corr for one sample (HWC inputs)."""
    H_d, W_d, C = embed0.shape
    e0 = torch.from_numpy(embed0).permute(2, 0, 1)[None]  # (1, C, H, W)
    e1 = torch.from_numpy(embed1).permute(2, 0, 1)[None]
    t = torch.from_numpy(targets)
    tid0, tid1 = t[0, :, 5], t[1, :, 5]
    n0 = int((tid0 != 0).sum())
    n1 = int((tid1 != 0).sum())
    idx0 = torch.nonzero(tid0 != 0).squeeze(1)
    idx1 = torch.nonzero(tid1 != 0).squeeze(1)

    row_label = torch.full((n0,), -1, dtype=torch.long)
    col_label = torch.full((n1,), -1, dtype=torch.long)
    for i in range(n0):
        for j in range(n1):
            if tid0[idx0[i]] == tid1[idx1[j]]:
                row_label[i] = j
                col_label[j] = i
                break

    def sample(e, ti, k):
        cx, cy = t[ti, k, 1:3] / s - 0.5
        cx = (torch.clamp(cx, 0, W_d - 1) / (W_d - 1) - 0.5) * 2
        cy = (torch.clamp(cy, 0, H_d - 1) / (H_d - 1) - 0.5) * 2
        grid = torch.stack([cx, cy]).view(1, 1, 1, 2)
        return F.grid_sample(e, grid, mode="bilinear", padding_mode="border",
                             align_corners=False).squeeze()

    E0 = torch.stack([sample(e0, 0, int(k)) for k in idx0])
    E1 = torch.stack([sample(e1, 1, int(k)) for k in idx1])
    sim = E0 @ E1.T
    loss = 0.5 * (F.cross_entropy(sim, row_label, ignore_index=-1)
                  + F.cross_entropy(sim.T, col_label, ignore_index=-1))
    return float(loss)


def test_mot_contrastive_parity():
    rng = np.random.RandomState(0)
    H_d = W_d = 16
    C, M = 8, 10
    for seed in range(3):
        rng = np.random.RandomState(seed)
        e0 = rng.randn(H_d, W_d, C).astype(np.float32)
        e1 = rng.randn(H_d, W_d, C).astype(np.float32)
        targets = np.zeros((2, M, 6), np.float32)
        n = rng.randint(2, 5)
        for k in range(n):
            targets[0, k] = [0, rng.uniform(5, 120), rng.uniform(5, 120),
                             20, 20, k + 1]
        perm = rng.permutation(n)
        for j, k in enumerate(perm):
            targets[1, j] = [0, rng.uniform(5, 120), rng.uniform(5, 120),
                             20, 20, k + 1]
        ours = float(mot_contrastive_loss_single(
            jnp.asarray(e0), jnp.asarray(e1), jnp.asarray(targets)))
        ref = torch_mot_corr(e0, e1, targets)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def torch_sot_prior_chain(embed0, embed1, box0, box1, H, W):
    """Oracle: get_label_map -> 1/8 downsample -> bmm propagate -> dice
    (unicorn.py:315-337 + 512-534)."""
    def label_map(box):
        x1, y1 = round(float(box[0] - box[2] / 2)), round(float(box[1] - box[3] / 2))
        x2, y2 = round(float(box[0] + box[2] / 2)), round(float(box[1] + box[3] / 2))
        lab = torch.zeros(1, 1, H, W)
        lab[0, 0, max(0, y1):y2, max(0, x1):x2] = 1.0
        return lab

    l0 = F.interpolate(label_map(box0), scale_factor=1 / 8, mode="bilinear",
                       align_corners=False).flatten(-2).flatten(1)  # (1, N)
    l1 = F.interpolate(label_map(box1), scale_factor=1 / 8, mode="bilinear",
                       align_corners=False).flatten(-2).flatten(1)
    e0 = torch.from_numpy(embed0).reshape(-1, embed0.shape[-1])  # (N, C)
    e1 = torch.from_numpy(embed1).reshape(-1, embed1.shape[-1])
    sim = e0 @ e1.T
    trans = torch.softmax(sim, dim=0)
    pred = l0 @ trans  # (1, N)
    eps = 1e-5
    inter = (pred * l1).sum()
    union = (pred ** 2).sum() + (l1 ** 2).sum() + eps
    return pred.numpy(), float(1 - 2 * inter / union)


def test_sot_prior_chain_parity():
    rng = np.random.RandomState(1)
    H = W = 64
    H8 = W8 = 8
    C = 8
    e0 = rng.randn(H8, W8, C).astype(np.float32)
    e1 = rng.randn(H8, W8, C).astype(np.float32)
    box0 = np.array([30.0, 28.0, 24.0, 20.0])
    box1 = np.array([34.0, 30.0, 24.0, 22.0])

    lbs0 = resize_bilinear_torch(
        box_label_map(jnp.asarray(box0[None]), H, W)[..., None], H8, W8)
    gt1 = resize_bilinear_torch(
        box_label_map(jnp.asarray(box1[None]), H, W)[..., None], H8, W8)
    pred = correlation_propagate_dense(
        jnp.asarray(e0).reshape(1, -1, C), jnp.asarray(e1).reshape(1, -1, C),
        lbs0.reshape(1, 1, -1))
    ours_dice = float(dice_loss(pred.reshape(1, -1), gt1.reshape(1, -1)))

    ref_pred, ref_dice = torch_sot_prior_chain(e0, e1, box0, box1, H, W)
    np.testing.assert_allclose(np.asarray(pred).reshape(-1), ref_pred.reshape(-1),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(ours_dice, ref_dice, rtol=1e-4)
