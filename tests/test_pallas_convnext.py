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


def test_dwconv7x7_blocked_matches_ref():
    """Block-diagonal grouped formulation == depthwise reference for every
    valid blk (incl. blk=C dense), fp32 exact; grads wrt the dw kernel flow
    through the trace-time expansion and match autodiff of the ref."""
    from unicorn_tpu.ops.pallas_convnext import (
        dwconv7x7_blocked, dwconv7x7_ref)

    rng = np.random.RandomState(7)
    for (B, H, W, C) in [(1, 9, 11, 8), (2, 13, 17, 96)]:
        x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32))
        k = jnp.asarray(rng.randn(7, 7, 1, C).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
        ref = dwconv7x7_ref(x, k, b)
        for blk in (1, 4, 8, C, 5):  # 5 doesn't divide C -> ref fallback
            out = dwconv7x7_blocked(x, k, b, blk=blk)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-5, atol=2e-5)
    gk = jax.grad(lambda k_: jnp.sum(
        dwconv7x7_blocked(x, k_, b, blk=8) ** 2))(k)
    gk_ref = jax.grad(lambda k_: jnp.sum(dwconv7x7_ref(x, k_, b) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_ref),
                               rtol=2e-4, atol=2e-4)


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


def test_dw_custom_vjp_grads_match_autodiff():
    """dw_grads_restructured / dwconv7x7_cvjp: restructured backward must
    reproduce jax.vjp of the reference grouped-conv form (fp32) for x, W,
    and bias — including non-uniform cotangents and B>1."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.ops.pallas_convnext import (
        dw_grads_restructured, dwconv7x7_cvjp, dwconv7x7_ref,
    )

    rng = np.random.RandomState(0)
    B, H, W, C = 2, 12, 16, 8
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    k = jnp.asarray(rng.randn(7, 7, 1, C).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    dy = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))

    out_ref, vjp = jax.vjp(dwconv7x7_ref, x, k, b)
    dx_ref, dk_ref, db_ref = vjp(dy)
    dx, dk, db = dw_grads_restructured(x, k, dy)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                               rtol=1e-5, atol=1e-5)

    # end-to-end through the custom_vjp wrapper inside a scalar loss
    def loss_cvjp(x, k, b):
        return jnp.sum(jnp.sin(dwconv7x7_cvjp(x, k, b)))

    def loss_ref(x, k, b):
        return jnp.sum(jnp.sin(dwconv7x7_ref(x, k, b)))

    g_c = jax.grad(loss_cvjp, argnums=(0, 1, 2))(x, k, b)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for a, r in zip(g_c, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-4)

    # forward identical
    np.testing.assert_array_equal(np.asarray(dwconv7x7_cvjp(x, k, b)),
                                  np.asarray(out_ref))


def test_dw_custom_vjp_flag_routes_block():
    """set_dw_custom_vjp flips the DepthwiseConv7x7 module onto the
    restructured-VJP path with identical forward numerics and matching
    train gradients."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.models.blocks import DepthwiseConv7x7
    from unicorn_tpu.ops.pallas_convnext import set_dw_custom_vjp

    m = DepthwiseConv7x7(8)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 10, 12, 8).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p, x):
        return jnp.sum(m.apply(p, x) ** 2)

    l0, g0 = jax.value_and_grad(loss)(params, x)
    set_dw_custom_vjp(True)
    try:
        l1, g1 = jax.value_and_grad(loss)(params, x)
    finally:
        set_dw_custom_vjp(False)
    assert float(l0) == float(l1)
    for a, r in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-5, atol=1e-4)
