"""Torch->flax checkpoint converter: representative keys land in the right
flax slots with the right transposes, and values round-trip exactly."""
import sys, os
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_weights import convert_state_dict, insert_into_tree

from unicorn_tpu.models.unicorn import Unicorn


def _params():
    model = Unicorn(num_classes=8, backbone_name="convnext_tiny",
                    in_channels=(192, 384, 768), interact_mode="deform",
                    n_layer_att=1, use_mask=True, use_raft=True)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      method=Unicorn.init_all)


def test_convert_representative_keys():
    params = _params()
    rng = np.random.RandomState(0)
    fake = {
        # convnext stem conv (O, I, kh, kw)
        "backbone.backbone.downsample_layers.0.0.weight":
            rng.randn(96, 3, 4, 4).astype(np.float32),
        # stage block pwconv (linear O, I)
        "backbone.backbone.stages.1.0.pwconv1.weight":
            rng.randn(768, 192).astype(np.float32),
        "backbone.backbone.stages.1.0.gamma":
            rng.randn(192).astype(np.float32),
        # PAFPN BaseConv + GN
        "backbone.lateral_conv0.conv.weight":
            rng.randn(384, 768, 1, 1).astype(np.float32),
        "backbone.lateral_conv0.bn.weight":
            rng.randn(384).astype(np.float32),
        # CSP bottleneck conv
        "backbone.C3_p4.m.1.conv2.conv.weight":
            rng.randn(192, 192, 3, 3).astype(np.float32),
        # head pred + beta
        "head.cls_preds_sot.2.bias": rng.randn(1).astype(np.float32),
        "head.beta_0": rng.randn(256, 1, 1).astype(np.float32),
        # controller (3x3 in the reference, unicorn_head_mask.py:78-87)
        "head.controllers.1.weight": rng.randn(169, 256, 3, 3).astype(np.float32),
        # transformer
        "transformer.encoder.layers.0.self_attn.value_proj.weight":
            rng.randn(256, 256).astype(np.float32),
        "transformer.level_embed": rng.randn(2, 256).astype(np.float32),
        # bottleneck GN
        "bottleneck.1.weight": rng.randn(256).astype(np.float32),
        # upsample conv
        "upsample_layer.3.weight": rng.randn(128, 256, 3, 3).astype(np.float32),
        # mask branch
        "head.mask_branch.tower.4.weight": rng.randn(8, 128, 1, 1).astype(np.float32),
        # something unmapped on purpose
        "head.grids.0": np.zeros(1, np.float32),
    }
    mapped, missed = convert_state_dict(fake, depth=1.0)
    assert missed == ["head.grids.0"], missed
    params["params"], n_ok, mism = insert_into_tree(params["params"], mapped)
    assert n_ok == len(fake) - 1, (n_ok, mism)
    assert not mism, mism

    p = params["params"]
    # transposes are correct
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["ConvNeXt_0"]["stem_conv"]["kernel"]),
        fake["backbone.backbone.downsample_layers.0.0.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["ConvNeXt_0"]["stage1_block0"]["Dense_0"]["kernel"]),
        fake["backbone.backbone.stages.1.0.pwconv1.weight"].T)
    np.testing.assert_allclose(
        np.asarray(p["backbone"]["C3_p4"]["Bottleneck_1"]["BaseConv_1"]["Conv_0"]["kernel"]),
        fake["backbone.C3_p4.m.1.conv2.conv.weight"].transpose(2, 3, 1, 0))
    np.testing.assert_allclose(
        np.asarray(p["head"]["beta_0"]), fake["head.beta_0"].reshape(-1))
    np.testing.assert_allclose(
        np.asarray(p["interaction"]["layer0"]["value_proj"]["kernel"]),
        fake["transformer.encoder.layers.0.self_attn.value_proj.weight"].T)
    np.testing.assert_allclose(
        np.asarray(p["mask_branch"]["tower_out"]["kernel"]),
        fake["head.mask_branch.tower.4.weight"].transpose(2, 3, 1, 0))
