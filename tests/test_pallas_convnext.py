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
