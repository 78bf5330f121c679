"""On-device NMS vs host torchvision-parity postprocess."""
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.ops.nms import postprocess_device
from unicorn_tpu.utils.boxes import postprocess


def _rand_preds(B=2, A=300, C=8, seed=0):
    rng = np.random.RandomState(seed)
    cx = rng.uniform(20, 100, (B, A))
    cy = rng.uniform(20, 100, (B, A))
    w = rng.uniform(5, 40, (B, A))
    h = rng.uniform(5, 40, (B, A))
    obj = rng.rand(B, A)
    cls = rng.rand(B, A, C)
    return np.concatenate(
        [np.stack([cx, cy, w, h], -1), obj[..., None], cls], -1
    ).astype(np.float32)


def test_device_postprocess_matches_host():
    preds = _rand_preds()
    host = postprocess(preds.copy(), num_classes=8, conf_thre=0.5, nms_thre=0.5)
    dets, valid = postprocess_device(
        jnp.asarray(preds), num_classes=8, conf_thre=0.5, nms_thre=0.5,
        n_cand=300, max_out=128,
    )
    dets, valid = np.asarray(dets), np.asarray(valid)
    for i in range(preds.shape[0]):
        d_dev = dets[i][valid[i]]
        d_host = host[i]
        if d_host is None:
            assert len(d_dev) == 0
            continue
        # same number of surviving boxes, same boxes in same score order
        assert len(d_dev) == len(d_host), (len(d_dev), len(d_host))
        # host output is ordered per-class-nms; sort both by score for compare
        o_dev = np.argsort(-(d_dev[:, 4] * d_dev[:, 5]), kind="stable")
        o_host = np.argsort(-(d_host[:, 4] * d_host[:, 5]), kind="stable")
        np.testing.assert_allclose(d_dev[o_dev], d_host[o_host],
                                   rtol=1e-4, atol=1e-3)


def test_device_postprocess_class_agnostic():
    preds = _rand_preds(seed=1)
    host = postprocess(preds.copy(), num_classes=8, conf_thre=0.5,
                       nms_thre=0.5, class_agnostic=True)
    dets, valid = postprocess_device(
        jnp.asarray(preds), num_classes=8, conf_thre=0.5, nms_thre=0.5,
        class_agnostic=True, n_cand=300, max_out=128,
    )
    dets, valid = np.asarray(dets), np.asarray(valid)
    for i in range(preds.shape[0]):
        d_dev = dets[i][valid[i]]
        d_host = host[i]
        n_host = 0 if d_host is None else len(d_host)
        assert len(d_dev) == n_host
        if n_host:
            np.testing.assert_allclose(d_dev, d_host, rtol=1e-4, atol=1e-3)


def test_device_postprocess_empty():
    preds = _rand_preds(seed=2)
    preds[..., 4] = 0.0  # obj zero -> no det passes conf
    dets, valid = postprocess_device(
        jnp.asarray(preds), num_classes=8, conf_thre=0.5, nms_thre=0.5,
        n_cand=300, max_out=128,
    )
    assert not np.asarray(valid).any()


def test_cluster_nms_matches_sequential():
    """Cluster-NMS fixed point == exact sequential greedy NMS."""
    from unicorn_tpu.ops.nms import nms_fixed

    rng = np.random.RandomState(0)
    for seed in range(5):
        rng = np.random.RandomState(seed)
        n = 64
        cx = rng.uniform(0, 100, n)
        cy = rng.uniform(0, 100, n)
        w = rng.uniform(10, 40, n)
        h = rng.uniform(10, 40, n)
        boxes = jnp.asarray(
            np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], 1),
            jnp.float32)
        scores = jnp.asarray(rng.rand(n).astype(np.float32))
        k_seq, o_seq = nms_fixed(boxes, scores, 0.5, n)
        k_cl, o_cl = nms_fixed(boxes, scores, 0.5, n, cluster_iters=16)
        np.testing.assert_array_equal(np.asarray(k_seq), np.asarray(k_cl))
        np.testing.assert_array_equal(np.asarray(o_seq), np.asarray(o_cl))


def test_postprocess_device_return_idx():
    """return_idx: each kept row's anchor index must decode to that row's
    xyxy box (the CondInst controller-gather contract)."""
    rng = np.random.RandomState(3)
    A, C = 200, 3
    pred = np.zeros((1, A, 5 + C), np.float32)
    pred[0, :, 0] = rng.uniform(20, 100, A)
    pred[0, :, 1] = rng.uniform(20, 100, A)
    pred[0, :, 2:4] = rng.uniform(10, 30, (A, 2))
    pred[0, :, 4] = rng.rand(A)
    pred[0, :, 5:] = rng.rand(A, C)
    dets, valid, idx = postprocess_device(
        jnp.asarray(pred), num_classes=C, conf_thre=0.05, nms_thre=0.5,
        n_cand=64, max_out=16, return_idx=True)
    dets, valid, idx = np.asarray(dets)[0], np.asarray(valid)[0], np.asarray(idx)[0]
    assert valid.any()
    for k in np.flatnonzero(valid):
        cx, cy, w, h = pred[0, idx[k], :4]
        np.testing.assert_allclose(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
            dets[k, :4], rtol=1e-5)
