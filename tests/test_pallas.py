"""Pallas kernels vs XLA oracles (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.ops.correlation import correlation_propagate_dense
from unicorn_tpu.ops.pallas_correlation import (
    correlation_propagate_pallas,
    pick_blocks,
)


def test_pallas_correlation_matches_dense():
    rng = np.random.RandomState(0)
    B, N, C, K = 1, 512, 32, 2
    e0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    e1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    v = jnp.asarray(rng.rand(B, K, N).astype(np.float32))
    out = correlation_propagate_pallas(e0, e1, v, block_i=128, block_j=128,
                                       interpret=True)
    ref = correlation_propagate_dense(e0, e1, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_correlation_sharp_softmax_stability():
    """Large-magnitude logits: online softmax must stay finite."""
    rng = np.random.RandomState(1)
    B, N, C, K = 1, 256, 16, 1
    e0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 10)
    e1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32) * 10)
    v = jnp.asarray(rng.rand(B, K, N).astype(np.float32))
    out = correlation_propagate_pallas(e0, e1, v, block_i=64, block_j=64,
                                       interpret=True)
    ref = correlation_propagate_dense(e0, e1, v)
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-5)


def test_pick_blocks():
    bi, bj = pick_blocks(16000)   # 800x1280 -> H8*W8
    assert bi % 128 == 0 and bj % 128 == 0
    bi2, bj2 = pick_blocks(5120)  # 640x1024
    assert bi2 == 512 and bj2 % 128 == 0


def test_pallas_correlation_padded_n():
    """N not a multiple of the block sizes: padded rows must not leak."""
    rng = np.random.RandomState(2)
    B, N, C, K = 1, 200, 16, 2
    e0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    e1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    v = jnp.asarray(rng.rand(B, K, N).astype(np.float32))
    out = correlation_propagate_pallas(e0, e1, v, block_i=128, block_j=128,
                                       interpret=True)
    ref = correlation_propagate_dense(e0, e1, v)
    assert out.shape == (B, K, N)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_vjp_matches_dense_grads():
    import jax

    from unicorn_tpu.ops.pallas_correlation import (
        correlation_propagate_pallas_vjp,
    )

    rng = np.random.RandomState(3)
    B, N, C, K = 1, 200, 16, 2
    e0 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    e1 = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
    v = jnp.asarray(rng.rand(B, K, N).astype(np.float32))
    w = jnp.asarray(rng.randn(B, K, N).astype(np.float32))

    def loss_p(e0, e1, v):
        return jnp.sum(
            correlation_propagate_pallas_vjp(e0, e1, v, 128, 128, True) * w)

    def loss_d(e0, e1, v):
        return jnp.sum(correlation_propagate_dense(e0, e1, v) * w)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(e0, e1, v)
    gd = jax.grad(loss_d, argnums=(0, 1, 2))(e0, e1, v)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
