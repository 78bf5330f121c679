"""Correctness tests for TPU-native ops against dense/loop oracles
(mirrors the reference's dual-implementation test pattern, ops/test.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.ops.correlation import (
    box_label_map,
    correlation_propagate,
    correlation_propagate_dense,
    dice_loss,
    grid_sample_at_points,
)
from unicorn_tpu.ops.deform_attn import ms_deform_attn, ms_deform_attn_reference


def test_correlation_propagate_matches_dense():
    rng = np.random.RandomState(0)
    B, N, C, K = 2, 100, 16, 3
    e0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    e1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    lbs = jnp.asarray(rng.rand(B, K, N).astype(np.float32))
    out_chunked = correlation_propagate(e0, e1, lbs, chunk=32)
    out_dense = correlation_propagate_dense(e0, e1, lbs)
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(out_dense),
                               rtol=1e-5, atol=1e-5)


def test_correlation_propagate_grad():
    rng = np.random.RandomState(1)
    B, N, C = 1, 64, 8
    e0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    e1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    lbs = jnp.asarray(rng.rand(B, 1, N).astype(np.float32))

    def f(e0, e1):
        return jnp.sum(correlation_propagate(e0, e1, lbs, chunk=16) ** 2)

    def f_dense(e0, e1):
        return jnp.sum(correlation_propagate_dense(e0, e1, lbs) ** 2)

    g1 = jax.grad(f, argnums=(0, 1))(e0, e1)
    g2 = jax.grad(f_dense, argnums=(0, 1))(e0, e1)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_matches_oracle():
    rng = np.random.RandomState(0)
    B, L, H, W, M, D = 1, 2, 6, 8, 2, 4
    Lq, P = 10, 4
    value = rng.randn(B, L, H, W, M, D).astype(np.float32)
    locs = rng.rand(B, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1  # incl. OOB
    attw = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attw /= attw.reshape(B, Lq, M, -1).sum(-1)[..., None].reshape(B, Lq, M, 1, 1)

    ref = ms_deform_attn_reference(value, locs, attw)
    for method in ("gather", "onehot"):
        out = ms_deform_attn(jnp.asarray(value), jnp.asarray(locs),
                             jnp.asarray(attw), method=method, q_chunk=4)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5,
                                   err_msg=method)
    from unicorn_tpu.ops.deform_attn import _msda_onehot_factored

    out_f = _msda_onehot_factored(jnp.asarray(value), jnp.asarray(locs),
                                  jnp.asarray(attw), q_chunk=4)
    np.testing.assert_allclose(np.asarray(out_f), ref, rtol=1e-4, atol=1e-5,
                               err_msg="onehot_factored")


def test_ms_deform_attn_onehot_grads_match_gather():
    rng = np.random.RandomState(1)
    B, L, H, W, M, D = 1, 2, 5, 6, 2, 4
    Lq, P = 8, 4
    value = jnp.asarray(rng.randn(B, L, H, W, M, D).astype(np.float32))
    locs = jnp.asarray(rng.rand(B, Lq, M, L, P, 2).astype(np.float32))
    attw = jnp.asarray(
        jax.nn.softmax(rng.randn(B, Lq, M, L * P).astype(np.float32), -1)
        .reshape(B, Lq, M, L, P))
    def loss(method):
        return jax.grad(
            lambda v, l, w: jnp.sum(ms_deform_attn(v, l, w, method=method,
                                                   q_chunk=4) ** 2),
            argnums=(0, 1, 2))(value, locs, attw)
    g1, g2 = loss("gather"), loss("onehot")
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # factored build (the TPU auto path) must differentiate identically too
    g3 = loss("onehot_factored")
    for a, b in zip(g1, g3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_pallas_matches_oracle():
    """Fused Pallas sampling kernel (interpret mode on CPU) == loop oracle,
    including out-of-range corners and Lq/HW padding paths."""
    from unicorn_tpu.ops.deform_attn import _msda_pallas

    rng = np.random.RandomState(2)
    B, L, H, W, M, D = 2, 2, 7, 9, 3, 8
    Lq, P = 29, 4
    value = rng.randn(B, L, H, W, M, D).astype(np.float32)
    locs = rng.rand(B, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1  # incl. OOB
    attw = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attw /= attw.reshape(B, Lq, M, -1).sum(-1)[..., None].reshape(B, Lq, M, 1, 1)

    ref = ms_deform_attn_reference(value, locs, attw)
    out = _msda_pallas(jnp.asarray(value), jnp.asarray(locs),
                       jnp.asarray(attw), interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_auto_dispatch(monkeypatch):
    """'auto' routes: TPU+bf16 -> pallas_factored (serving), TPU+fp32 ->
    onehot_factored (training), CPU -> gather; set_msda_method overrides."""
    import unicorn_tpu.ops.deform_attn as da

    calls = []

    def record(name):
        def fn(*a, **kw):
            calls.append(name)
            return jnp.zeros((1, 4, 8))
        return fn

    monkeypatch.setattr(da, "_msda_gather", record("gather"))
    monkeypatch.setattr(da, "_msda_onehot_factored", record("onehot_factored"))
    monkeypatch.setattr(da, "_msda_pallas_factored_vjp",
                        record("pallas_factored"))
    v32 = jnp.zeros((1, 2, 4, 4, 2, 4), jnp.float32)
    v16 = v32.astype(jnp.bfloat16)
    locs = jnp.zeros((1, 4, 2, 2, 4, 2))
    attw = jnp.zeros((1, 4, 2, 2, 4))

    monkeypatch.setattr(da.jax, "default_backend", lambda: "cpu")
    da.ms_deform_attn(v32, locs, attw)
    monkeypatch.setattr(da.jax, "default_backend", lambda: "tpu")
    da.ms_deform_attn(v32, locs, attw)
    da.ms_deform_attn(v16, locs, attw)
    da.set_msda_method("onehot_factored")
    try:
        da.ms_deform_attn(v16, locs, attw)
    finally:
        da.set_msda_method(None)
    assert calls == ["gather", "onehot_factored", "pallas_factored",
                     "onehot_factored"]
    # VMEM guard: a stride-8-sized map (HW=20000) must NOT route to the
    # fused kernel (its (H,W,QB) fp32 tile alone would be ~20 MB > VMEM)
    calls.clear()
    v_big = jnp.zeros((1, 1, 100, 200, 2, 4), jnp.bfloat16)
    locs1 = jnp.zeros((1, 4, 2, 1, 4, 2))
    attw1 = jnp.zeros((1, 4, 2, 1, 4))
    da.ms_deform_attn(v_big, locs1, attw1)
    assert calls == ["onehot_factored"]
    # unknown method names raise with the accepted list
    import pytest

    with pytest.raises(ValueError, match="pallas_factored"):
        da.set_msda_method("palas_factored")


def test_ms_deform_attn_pallas_factored_matches_oracle():
    """Fused FACTORED Pallas kernel (interpret mode on CPU) == loop oracle,
    including out-of-range corners, Lq padding, and W lane padding."""
    from unicorn_tpu.ops.deform_attn import _msda_pallas_factored

    rng = np.random.RandomState(5)
    B, L, H, W, M, D = 2, 2, 7, 9, 3, 8
    Lq, P = 29, 4
    value = rng.randn(B, L, H, W, M, D).astype(np.float32)
    locs = rng.rand(B, Lq, M, L, P, 2).astype(np.float32) * 1.2 - 0.1  # incl. OOB
    attw = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attw /= attw.reshape(B, Lq, M, -1).sum(-1)[..., None].reshape(B, Lq, M, 1, 1)

    ref = ms_deform_attn_reference(value, locs, attw)
    out = _msda_pallas_factored(jnp.asarray(value), jnp.asarray(locs),
                                jnp.asarray(attw), interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_pallas_factored_vjp_matches_gather():
    """pallas_factored's custom VJP (backward through the XLA factored
    one-hot path) must agree with gather autodiff."""
    import unicorn_tpu.ops.deform_attn as da

    rng = np.random.RandomState(7)
    B, L, H, W, M, D = 1, 2, 5, 6, 2, 4
    Lq, P = 8, 4
    value = jnp.asarray(rng.randn(B, L, H, W, M, D).astype(np.float32))
    locs = jnp.asarray(rng.rand(B, Lq, M, L, P, 2).astype(np.float32))
    attw = jnp.asarray(
        jax.nn.softmax(rng.randn(B, Lq, M, L * P).astype(np.float32), -1)
        .reshape(B, Lq, M, L, P))

    orig = da._msda_pallas_factored
    da._msda_pallas_factored = \
        lambda v, l, w, q_block=256, interpret=True: orig(v, l, w, q_block, True)
    try:
        gp = jax.grad(
            lambda v, l, w: jnp.sum(da._msda_pallas_factored_vjp(v, l, w) ** 2),
            argnums=(0, 1, 2))(value, locs, attw)
    finally:
        da._msda_pallas_factored = orig
    gg = jax.grad(lambda v, l, w: jnp.sum(ms_deform_attn(
        v, l, w, method="gather") ** 2), argnums=(0, 1, 2))(value, locs, attw)
    for a, b in zip(gp, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_pallas_vjp_matches_gather():
    """The pallas method's custom VJP (backward recomputed through the XLA
    one-hot path) must agree with gather autodiff."""
    import unicorn_tpu.ops.deform_attn as da

    rng = np.random.RandomState(3)
    B, L, H, W, M, D = 1, 2, 5, 6, 2, 4
    Lq, P = 8, 4
    value = jnp.asarray(rng.randn(B, L, H, W, M, D).astype(np.float32))
    locs = jnp.asarray(rng.rand(B, Lq, M, L, P, 2).astype(np.float32))
    attw = jnp.asarray(
        jax.nn.softmax(rng.randn(B, Lq, M, L * P).astype(np.float32), -1)
        .reshape(B, Lq, M, L, P))

    orig = da._msda_pallas
    da._msda_pallas = lambda v, l, w, q_block=256, interpret=True: orig(
        v, l, w, q_block, True)
    try:
        gp = jax.grad(lambda v, l, w: jnp.sum(da._msda_pallas_vjp(v, l, w) ** 2),
                      argnums=(0, 1, 2))(value, locs, attw)
    finally:
        da._msda_pallas = orig
    gg = jax.grad(lambda v, l, w: jnp.sum(ms_deform_attn(
        v, l, w, method="gather") ** 2), argnums=(0, 1, 2))(value, locs, attw)
    for a, b in zip(gp, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_ms_deform_attn_grad_finite():
    rng = np.random.RandomState(0)
    B, L, H, W, M, D = 1, 2, 4, 4, 2, 4
    Lq, P = 6, 4
    value = jnp.asarray(rng.randn(B, L, H, W, M, D).astype(np.float32))
    locs = jnp.asarray(rng.rand(B, Lq, M, L, P, 2).astype(np.float32))
    attw = jnp.asarray(
        jax.nn.softmax(rng.randn(B, Lq, M, L * P).astype(np.float32), -1)
        .reshape(B, Lq, M, L, P)
    )
    g = jax.grad(lambda v, l, w: jnp.sum(ms_deform_attn(v, l, w) ** 2),
                 argnums=(0, 1, 2))(value, locs, attw)
    for x in g:
        assert np.all(np.isfinite(np.asarray(x)))


def test_box_label_map():
    boxes = jnp.asarray([[8.0, 8.0, 8.0, 8.0]])  # cx cy w h -> [4,12)x[4,12)
    m = box_label_map(boxes, 16, 16)
    assert m.shape == (1, 16, 16)
    assert float(m.sum()) == 64.0
    assert float(m[0, 4, 4]) == 1.0 and float(m[0, 12, 12]) == 0.0


def test_grid_sample_points():
    feat = jnp.arange(16, dtype=jnp.float32).reshape(4, 4, 1)
    # exact pixel centers
    pts = jnp.asarray([[1.0, 2.0], [0.0, 0.0]])
    out = grid_sample_at_points(feat, pts)
    assert float(out[0, 0]) == 9.0  # row 2, col 1
    assert float(out[1, 0]) == 0.0
    # halfway between (0,0) and (1,0): expect 0.5
    out2 = grid_sample_at_points(feat, jnp.asarray([[0.5, 0.0]]))
    assert abs(float(out2[0, 0]) - 0.5) < 1e-6


def test_dice_loss_masked_equals_subset():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.rand(4, 8, 8).astype(np.float32))
    gt = jnp.asarray(rng.rand(4, 8, 8).astype(np.float32))
    mask = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    full = dice_loss(pred[jnp.asarray([0, 2])], gt[jnp.asarray([0, 2])])
    masked = dice_loss(pred, gt, sample_mask=mask)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)
