"""Fused ConvNeXt block Pallas kernel vs the plain-jnp reference.

Measured on v5e (bf16, 800x1280 shapes): the fused kernel wins only at the
(100,160,192) stage-1 shape (0.23 vs 0.33 ms); stage 0 and the head shapes
are VPU-roofline-bound either way and tiny stages become weight-DMA-bound,
so production keeps the XLA composition (blocks.ConvNeXtBlock) and this op
remains an explicit, oracle-tested alternative.
"""
import jax
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.ops.pallas_convnext import (
    convnext_block_pallas, convnext_block_ref)


def _params(rng, C):
    return {
        "Conv_0": {"kernel": jnp.asarray(rng.randn(7, 7, 1, C).astype(np.float32) * 0.1),
                   "bias": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)},
        "LayerNorm_0": {"scale": jnp.asarray(1 + 0.1 * rng.randn(C).astype(np.float32)),
                        "bias": jnp.asarray(0.1 * rng.randn(C).astype(np.float32))},
        "Dense_0": {"kernel": jnp.asarray(rng.randn(C, 4 * C).astype(np.float32) * 0.05),
                    "bias": jnp.asarray(rng.randn(4 * C).astype(np.float32) * 0.1)},
        "Dense_1": {"kernel": jnp.asarray(rng.randn(4 * C, C).astype(np.float32) * 0.05),
                    "bias": jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)},
        "gamma": jnp.asarray(np.full(C, 0.5, np.float32)),
    }


def test_fused_block_matches_ref_including_padding():
    """Interpret-mode kernel == reference at channel counts needing lane
    padding (96, 192) and a partial last row-slab (H=25)."""
    rng = np.random.RandomState(0)
    for (H, W, C) in [(16, 24, 96), (25, 40, 192)]:
        x = jnp.asarray(rng.randn(2, H, W, C).astype(np.float32))
        p = _params(rng, C)
        ref = convnext_block_ref(x, p, exact_gelu=False)
        out = convnext_block_pallas(x, p, exact_gelu=False, row_block=8,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


def test_dwconv7x7_pallas_matches_xla():
    """Dedicated dw-only kernel == XLA grouped conv: odd H/W, lane padding,
    fp32 and bf16, plus gradient flow through the custom VJP."""
    from unicorn_tpu.ops.pallas_convnext import (
        dwconv7x7, dwconv7x7_pallas, dwconv7x7_ref)

    rng = np.random.RandomState(2)
    for (B, H, W, C) in [(1, 16, 24, 8), (2, 13, 17, 96), (1, 25, 40, 192)]:
        x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 1, C).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        ref = dwconv7x7_ref(x, k, b)
        out = dwconv7x7_pallas(x, k, b, row_block=8, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-6, atol=2e-6)
    # bf16: taps quantized to bf16 first, so only accumulation order differs
    xb = x.astype(jnp.bfloat16)
    ref = dwconv7x7_ref(xb, k, b).astype(np.float32)
    out = np.asarray(dwconv7x7_pallas(xb, k, b, interpret=True)).astype(
        np.float32)
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # gradient: custom VJP routes through the XLA form
    g = jax.grad(lambda x_: jnp.sum(dwconv7x7(x_, k, b) ** 2))(x)
    g_ref = jax.grad(lambda x_: jnp.sum(dwconv7x7_ref(x_, k, b) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_depthwise_module_switch_param_compatible():
    """DepthwiseConv7x7 stand-in: identical param tree to the old nn.Conv
    form and bit-identical output on the XLA path."""
    import flax.linen as nn

    from unicorn_tpu.models.blocks import DepthwiseConv7x7

    rng = np.random.RandomState(3)
    C = 24
    x = jnp.asarray(rng.rand(1, 9, 11, C).astype(np.float32))
    old = nn.Conv(C, kernel_size=(7, 7), padding=((3, 3), (3, 3)),
                  feature_group_count=C, dtype=jnp.float32,
                  param_dtype=jnp.float32)
    new = DepthwiseConv7x7(C, dtype=jnp.float32)
    p_old = old.init(jax.random.PRNGKey(0), x)
    p_new = new.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(p_old)
            == jax.tree_util.tree_structure(p_new))
    assert (jax.tree.map(lambda a: a.shape, p_old)
            == jax.tree.map(lambda a: a.shape, p_new))
    np.testing.assert_array_equal(np.asarray(old.apply(p_old, x)),
                                  np.asarray(new.apply(p_old, x)))


def test_fused_block_ref_matches_flax_module():
    """convnext_block_ref (the VJP/backward path) == models.blocks.ConvNeXtBlock
    with the same weights."""
    from unicorn_tpu.models.blocks import ConvNeXtBlock

    rng = np.random.RandomState(1)
    C = 32
    x = jnp.asarray(rng.randn(1, 8, 10, C).astype(np.float32))
    blk = ConvNeXtBlock(dim=C, layer_scale_init_value=0.5, exact_gelu=False)
    variables = blk.init(jax.random.PRNGKey(0), x)
    ref_mod = blk.apply(variables, x)
    out = convnext_block_ref(x, variables["params"], exact_gelu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_mod),
                               rtol=1e-6, atol=1e-6)
