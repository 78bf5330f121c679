"""Convert reference PyTorch Unicorn checkpoints -> unicorn_tpu flax params.

Enables weight-level parity with the reference model zoo without retraining
(SURVEY.md §7 hard parts: "checkpoint conversion ... to hit parity"). Maps the
reference state_dict naming (unicorn/models/*) onto this repo's flax tree:

  torch conv  (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
  torch dwconv (C, 1, kh, kw) -> flax kernel (kh, kw, 1, C)
  torch linear (O, I)         -> flax kernel (I, O)
  GN/BN gamma/beta            -> GroupNorm scale/bias (the uni-stage reference
                                 checkpoints already carry GN, exp:152-156)

Usage:
  python tools/convert_torch_weights.py --torch-ckpt unicorn_track_tiny.pth \
      -f exps/default/unicorn_track_tiny.py --out Unicorn_outputs/unicorn_track_tiny
"""
import argparse
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_conv(w):
    return np.transpose(w, (2, 3, 1, 0))


def t_linear(w):
    return np.transpose(w, (1, 0))


def map_base_conv(dst, prefix):
    """Reference BaseConv '<p>.conv.weight' + '<p>.bn.{weight,bias}'."""
    return {
        "conv.weight": (f"{dst}/Conv_0/kernel", t_conv),
        "bn.weight": (f"{dst}/GroupNorm32_0/GroupNorm_0/scale", None),
        "bn.bias": (f"{dst}/GroupNorm32_0/GroupNorm_0/bias", None),
    }


def map_csp(dst, n_bottleneck=3):
    out = {}
    for src_c, dst_c in (("conv1", "BaseConv_0"), ("conv2", "BaseConv_1"),
                         ("conv3", "BaseConv_2")):
        for k, v in map_base_conv(f"{dst}/{dst_c}", "").items():
            out[f"{src_c}.{k}"] = v
    for b in range(n_bottleneck):
        for src_c, dst_c in (("conv1", "BaseConv_0"), ("conv2", "BaseConv_1")):
            for k, v in map_base_conv(f"{dst}/Bottleneck_{b}/{dst_c}", "").items():
                out[f"m.{b}.{src_c}.{k}"] = v
    return out


def map_convnext_block(dst):
    return {
        "dwconv.weight": (f"{dst}/Conv_0/kernel", t_conv),
        "dwconv.bias": (f"{dst}/Conv_0/bias", None),
        "norm.weight": (f"{dst}/LayerNorm_0/scale", None),
        "norm.bias": (f"{dst}/LayerNorm_0/bias", None),
        "pwconv1.weight": (f"{dst}/Dense_0/kernel", t_linear),
        "pwconv1.bias": (f"{dst}/Dense_0/bias", None),
        "pwconv2.weight": (f"{dst}/Dense_1/kernel", t_linear),
        "pwconv2.bias": (f"{dst}/Dense_1/bias", None),
        "gamma": (f"{dst}/gamma", None),
    }


def build_rules(depth=1.0, n_layer_att=3, n_levels=3):
    """Returns list of (regex, dst_template, transform) rules."""
    rules = []

    def add(pat, dst, tf=None):
        rules.append((re.compile(pat + "$"), dst, tf))

    # --- ConvNeXt backbone ---
    bb = "backbone/ConvNeXt_0"
    add(r"backbone\.backbone\.downsample_layers\.0\.0\.weight",
        f"{bb}/stem_conv/kernel", t_conv)
    add(r"backbone\.backbone\.downsample_layers\.0\.0\.bias",
        f"{bb}/stem_conv/bias")
    add(r"backbone\.backbone\.downsample_layers\.0\.1\.weight",
        f"{bb}/stem_norm/scale")
    add(r"backbone\.backbone\.downsample_layers\.0\.1\.bias",
        f"{bb}/stem_norm/bias")
    add(r"backbone\.backbone\.downsample_layers\.(\d+)\.0\.weight",
        f"{bb}/down_norm\\1/scale")
    add(r"backbone\.backbone\.downsample_layers\.(\d+)\.0\.bias",
        f"{bb}/down_norm\\1/bias")
    add(r"backbone\.backbone\.downsample_layers\.(\d+)\.1\.weight",
        f"{bb}/down_conv\\1/kernel", t_conv)
    add(r"backbone\.backbone\.downsample_layers\.(\d+)\.1\.bias",
        f"{bb}/down_conv\\1/bias")
    for src, (dst, tf) in [
        (k, v) for k, v in map_convnext_block(
            f"{bb}/stage\\1_block\\2").items()
    ]:
        add(r"backbone\.backbone\.stages\.(\d+)\.(\d+)\." +
            src.replace(".", r"\."), dst, tf)
    add(r"backbone\.backbone\.norm(\d+)\.weight", f"{bb}/out_norm\\1/scale")
    add(r"backbone\.backbone\.norm(\d+)\.bias", f"{bb}/out_norm\\1/bias")

    # --- PAFPN ---
    for name in ("lateral_conv0", "reduce_conv1", "bu_conv1", "bu_conv2",
                 "adjust0", "adjust1", "adjust2"):
        for src, (dst, tf) in map_base_conv(f"backbone/{name}", "").items():
            add(rf"backbone\.{name}\." + src.replace(".", r"\."), dst, tf)
    for csp in ("C3_p4", "C3_p3", "C3_n3", "C3_n4"):
        for src, (dst, tf) in map_csp(f"backbone/{csp}",
                                      n_bottleneck=round(3 * depth)).items():
            add(rf"backbone\.{csp}\." + src.replace(".", r"\."), dst, tf)

    # --- head ---
    for src, (dst, tf) in map_base_conv("head/stem\\1", "").items():
        add(r"head\.stems\.(\d+)\." + src.replace(".", r"\."), dst, tf)
    for tower, dst_t in (("cls_convs", "cls_conv"), ("reg_convs", "reg_conv")):
        for src, (dst, tf) in map_base_conv(f"head/{dst_t}\\1_\\2", "").items():
            add(rf"head\.{tower}\.(\d+)\.(\d+)\." + src.replace(".", r"\."),
                dst, tf)
    for pred, dst_p in (("cls_preds", "cls_pred"), ("reg_preds", "reg_pred"),
                        ("obj_preds", "obj_pred"),
                        ("cls_preds_sot", "cls_pred_sot"),
                        ("reg_preds_sot", "reg_pred_sot"),
                        ("obj_preds_sot", "obj_pred_sot"),
                        ("controllers", "controller")):
        # controllers are 3x3 (unicorn_head_mask.py:78-87); the rest are 1x1 —
        # t_conv handles both
        add(rf"head\.{pred}\.(\d+)\.weight", f"head/{dst_p}\\1/Conv_0/kernel",
            t_conv)
        add(rf"head\.{pred}\.(\d+)\.bias", f"head/{dst_p}\\1/Conv_0/bias")
    for src, (dst, tf) in map_convnext_block("head/att\\1_\\2").items():
        add(r"head\.att_layers\.(\d+)\.(\d+)\." + src.replace(".", r"\."),
            dst, tf)
    add(r"head\.beta_(\d+)", "head/beta_\\1",
        lambda w: w.reshape(-1))

    # --- bottleneck / upsample / pos emb / deformable transformer ---
    add(r"bottleneck\.0\.weight", "bottleneck/Conv_0/kernel", t_conv)
    add(r"bottleneck\.0\.bias", "bottleneck/Conv_0/bias")
    add(r"bottleneck\.1\.weight", "bottleneck/GroupNorm_0/scale")
    add(r"bottleneck\.1\.bias", "bottleneck/GroupNorm_0/bias")
    add(r"upsample_layer\.1\.weight", "upsample/Conv_0/kernel", t_conv)
    add(r"upsample_layer\.1\.bias", "upsample/Conv_0/bias")
    add(r"upsample_layer\.3\.weight", "upsample/Conv_1/kernel", t_conv)
    add(r"upsample_layer\.3\.bias", "upsample/Conv_1/bias")
    add(r"pos_emb\.row_embed\.weight", "pos_emb/row_embed")
    add(r"pos_emb\.col_embed\.weight", "pos_emb/col_embed")
    add(r"transformer\.level_embed", "interaction/level_embed")
    for src, dst in (("sampling_offsets", "sampling_offsets"),
                     ("attention_weights", "attention_weights"),
                     ("value_proj", "value_proj"),
                     ("output_proj", "output_proj")):
        add(rf"transformer\.encoder\.layers\.(\d+)\.self_attn\.{src}\.weight",
            f"interaction/layer\\1/{dst}/kernel", t_linear)
        add(rf"transformer\.encoder\.layers\.(\d+)\.self_attn\.{src}\.bias",
            f"interaction/layer\\1/{dst}/bias")
    add(r"transformer\.encoder\.layers\.(\d+)\.norm1\.weight",
        "interaction/layer\\1/LayerNorm_0/scale")
    add(r"transformer\.encoder\.layers\.(\d+)\.norm1\.bias",
        "interaction/layer\\1/LayerNorm_0/bias")
    add(r"transformer\.encoder\.layers\.(\d+)\.linear1\.weight",
        "interaction/layer\\1/Dense_0/kernel", t_linear)
    add(r"transformer\.encoder\.layers\.(\d+)\.linear1\.bias",
        "interaction/layer\\1/Dense_0/bias")
    add(r"transformer\.encoder\.layers\.(\d+)\.linear2\.weight",
        "interaction/layer\\1/Dense_1/kernel", t_linear)
    add(r"transformer\.encoder\.layers\.(\d+)\.linear2\.bias",
        "interaction/layer\\1/Dense_1/bias")
    add(r"transformer\.encoder\.layers\.(\d+)\.norm2\.weight",
        "interaction/layer\\1/LayerNorm_1/scale")
    add(r"transformer\.encoder\.layers\.(\d+)\.norm2\.bias",
        "interaction/layer\\1/LayerNorm_1/bias")

    # --- CondInst mask branch ---
    # reference conv_with_kaiming_uniform blocks are Sequential(conv(no bias),
    # norm): keys <name>.<i>.0.weight / .1.weight / .1.bias
    for name, dst_name, n in (("refine", "refine", 3), ("tower", "tower", 4)):
        for i in range(n):
            add(rf"head\.mask_branch\.{name}\.{i}\.0\.weight",
                f"mask_branch/{dst_name}{i}/Conv_0/kernel", t_conv)
            add(rf"head\.mask_branch\.{name}\.{i}\.1\.weight",
                f"mask_branch/{dst_name}{i}/GroupNorm32_0/GroupNorm_0/scale")
            add(rf"head\.mask_branch\.{name}\.{i}\.1\.bias",
                f"mask_branch/{dst_name}{i}/GroupNorm32_0/GroupNorm_0/bias")
    add(r"head\.mask_branch\.tower\.4\.weight", "mask_branch/tower_out/kernel",
        t_conv)
    add(r"head\.mask_branch\.tower\.4\.bias", "mask_branch/tower_out/bias")
    add(r"head\.mask_branch\.up_mask_layer\.0\.weight",
        "mask_branch/up_mask_conv1/kernel", t_conv)
    add(r"head\.mask_branch\.up_mask_layer\.0\.bias",
        "mask_branch/up_mask_conv1/bias")
    add(r"head\.mask_branch\.up_mask_layer\.2\.weight",
        "mask_branch/up_mask_conv2/kernel", t_conv)
    add(r"head\.mask_branch\.up_mask_layer\.2\.bias",
        "mask_branch/up_mask_conv2/bias")
    return rules


def convert_state_dict(state_dict, depth=1.0):
    """torch name -> (flax path string, np array). Returns (mapped, missed)."""
    rules = build_rules(depth=depth)
    # non-parameter torch buffers with no flax counterpart (constants /
    # training iteration counters)
    ignore = ("mask_head.sizes_of_interest", "mask_head._iter")
    mapped, missed = {}, []
    for k, w in state_dict.items():
        if any(k.endswith(suf) for suf in ignore):
            continue
        w = np.asarray(w)
        hit = False
        for pat, dst, tf in rules:
            m = pat.match(k)
            if m:
                path = m.expand(dst) if "\\" in dst else dst
                mapped[path] = tf(w) if tf else w
                hit = True
                break
        if not hit:
            missed.append(k)
    return mapped, missed


def insert_into_tree(params, mapped):
    """Place flat 'a/b/c' entries into the nested flax params dict where
    shapes agree. Returns (params, n_ok, mismatches)."""
    n_ok, mism = 0, []
    for path, w in mapped.items():
        parts = path.split("/")
        d = params
        ok = True
        for p in parts[:-1]:
            if p not in d:
                ok = False
                break
            d = d[p]
        if not ok or parts[-1] not in d:
            mism.append((path, "missing"))
            continue
        if tuple(d[parts[-1]].shape) != tuple(w.shape):
            mism.append((path, f"shape {d[parts[-1]].shape} vs {w.shape}"))
            continue
        import jax.numpy as jnp

        d[parts[-1]] = jnp.asarray(w)
        n_ok += 1
    return params, n_ok, mism


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--torch-ckpt", required=True)
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import torch

    import jax
    import jax.numpy as jnp

    from unicorn_tpu.core.checkpoint import save_checkpoint
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.models.unicorn import Unicorn

    ckpt = torch.load(args.torch_ckpt, map_location="cpu")
    state_dict = ckpt.get("model", ckpt)
    state_dict = {k: v.numpy() for k, v in state_dict.items()
                  if hasattr(v, "numpy")}

    exp = get_exp(args.exp_file, args.name)
    model = exp.get_model()
    dummy = jnp.zeros((1, *exp.input_size, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy, method=Unicorn.init_all)

    mapped, missed = convert_state_dict(state_dict, depth=exp.depth)
    params["params"], n_ok, mism = insert_into_tree(params["params"], mapped)
    print(f"converted {n_ok}/{len(state_dict)} tensors; "
          f"{len(missed)} unmatched torch keys, {len(mism)} placement issues")
    if missed[:10]:
        print("unmatched (first 10):", missed[:10])
    if mism[:10]:
        print("issues (first 10):", mism[:10])
    save_checkpoint(os.path.dirname(args.out) or ".", {"params": params},
                    os.path.basename(args.out))
    print("saved", args.out)


if __name__ == "__main__":
    main()
