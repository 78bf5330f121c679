"""Embedding-path parity for the MOT-omni inference chain (VERDICT r1 item 8):

1. The inference-time embedding sampling at box centers must match the
   reference's F.grid_sample chain (unicorn/evaluators/mot_evaluator.py:822-836:
   clamp(c/s - 0.5, 0, D-1) -> [-1,1] grid -> bilinear, border padding,
   align_corners=False).
2. QDTrack golden ids: my numpy QuasiDenseEmbedTracker must produce the exact
   id sequence of the reference torch tracker on a fixed multi-frame scenario
   with appear/disappear, backdrops, and near-duplicate embeddings.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from unicorn_tpu.losses.uni import sample_instance_embeddings  # noqa: E402
from unicorn_tpu.tracker.qd_tracker import QuasiDenseEmbedTracker  # noqa: E402


def _reference_sampling(embed_nchw, boxes_xyxy, img_size, s=8):
    """Verbatim coordinate chain of mot_evaluator.py:822-828."""
    feats = []
    e = torch.from_numpy(embed_nchw)
    for x1, y1, x2, y2 in boxes_xyxy:
        cx = torch.tensor((x1 + x2) / 2 / s - 0.5)
        cy = torch.tensor((y1 + y2) / 2 / s - 0.5)
        cx = (torch.clamp(cx, min=0, max=img_size[1] // s - 1)
              / (img_size[1] // s - 1) - 0.5) * 2.0
        cy = (torch.clamp(cy, min=0, max=img_size[0] // s - 1)
              / (img_size[0] // s - 1) - 0.5) * 2.0
        grid = torch.stack([cx, cy], dim=-1).view(1, 1, 1, 2)
        feats.append(F.grid_sample(e, grid.double(), mode="bilinear",
                                   padding_mode="border",
                                   align_corners=False).squeeze())
    return torch.stack(feats).numpy()


def test_inference_embedding_sampling_matches_grid_sample():
    rng = np.random.RandomState(0)
    img_size = (64, 96)
    H8, W8, C = img_size[0] // 8, img_size[1] // 8, 16
    embed = rng.randn(H8, W8, C)
    # boxes spanning in-range, edge, and out-of-range centers
    boxes = np.array([
        [10, 10, 30, 26],
        [0, 0, 4, 4],                 # near the top-left corner
        [-20, -10, -2, -2],           # center out of range -> border clamp
        [90, 60, 140, 90],            # beyond the right/bottom edge
        [40.3, 17.7, 55.9, 33.1],     # fractional center
    ], np.float64)
    ref = _reference_sampling(
        embed.transpose(2, 0, 1)[None], boxes, img_size)
    centers = np.stack([(boxes[:, 0] + boxes[:, 2]) / 2,
                        (boxes[:, 1] + boxes[:, 3]) / 2], axis=1)
    mine = np.asarray(sample_instance_embeddings(
        jnp.asarray(embed), jnp.asarray(centers), stride=8.0))
    np.testing.assert_allclose(mine, ref, rtol=1e-5, atol=1e-6)


def _scenario(rng, n_frames=7):
    """Fixed detection scenario: 3 stable objects, one leaves at t=3, one new
    at t=4, plus a low-score backdrop overlapping object 0 every frame."""
    base_emb = rng.randn(4, 32).astype(np.float32) * 3
    frames = []
    for t in range(n_frames):
        boxes, labels, embeds = [], [], []
        for k in range(3):
            if k == 1 and t >= 3:
                continue  # object 1 leaves
            b = np.array([30 + 60 * k + 2 * t, 40 + 3 * t,
                          70 + 60 * k + 2 * t, 90 + 3 * t, 0.9 - 0.05 * k])
            boxes.append(b)
            labels.append(k % 2)
            embeds.append(base_emb[k] + rng.randn(32).astype(np.float32) * .05)
        if t >= 4:  # newcomer
            boxes.append(np.array([250.0, 120.0, 290.0, 170.0, 0.85]))
            labels.append(1)
            embeds.append(base_emb[3] + rng.randn(32).astype(np.float32) * .05)
        # backdrop: low-score det overlapping object 0
        boxes.append(np.array([32 + 2 * t, 42 + 3 * t,
                               72 + 2 * t, 92 + 3 * t, 0.3]))
        labels.append(0)
        embeds.append(base_emb[0] + rng.randn(32).astype(np.float32) * .05)
        frames.append((np.stack(boxes).astype(np.float32),
                       np.asarray(labels, np.int64),
                       np.stack(embeds)))
    return frames


def test_qdtrack_golden_ids_vs_reference():
    try:
        from torch_ref import load_reference
    except ImportError:
        from tests.torch_ref import load_reference
    try:
        ns = load_reference()
    except ImportError as e:
        pytest.skip(f"reference tree unavailable: {e}")

    kw = dict(init_score_thr=0.7, obj_score_thr=0.5, match_score_thr=0.5)
    mine = QuasiDenseEmbedTracker(**kw)
    ref = ns.QuasiDenseEmbedTracker(**kw)

    frames = _scenario(np.random.RandomState(0))
    for t, (boxes, labels, embeds) in enumerate(frames):
        mb, ml, mids = mine.match(boxes, labels, embeds, t)
        rb, rl, rids = ref.match(torch.from_numpy(boxes),
                                 torch.from_numpy(labels),
                                 torch.from_numpy(embeds), t)
        np.testing.assert_allclose(mb, rb.numpy(), rtol=1e-6,
                                   err_msg=f"frame {t} boxes")
        np.testing.assert_array_equal(ml, rl.numpy(),
                                      err_msg=f"frame {t} labels")
        np.testing.assert_array_equal(mids, rids.numpy(),
                                      err_msg=f"frame {t} ids")
