"""Model export for deployment (the reference's tools/export_torchscript.py
equivalent): serializes the jitted forward to StableHLO / a jax AOT
executable via jax.export.

Usage:
  python tools/export_model.py -f exps/default/unicorn_track_tiny.py \
      -c <ckpt> --out unicorn_tiny.stablehlo
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()  # persistent compile cache: TPU graphs compile
    # through a slow remote queue; .jax_cache makes reruns instant

    p = argparse.ArgumentParser()
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--mode", default="whole", choices=["whole", "decode"])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.core.checkpoint import load_checkpoint
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.models.heads import decode_for_inference
    from unicorn_tpu.models.unicorn import Unicorn

    exp = get_exp(args.exp_file, args.name)
    model = exp.get_model()
    dummy = jnp.zeros((1, *exp.test_size, 3), jnp.float32)
    if args.ckpt:
        ckpt = load_checkpoint(os.path.dirname(args.ckpt) or ".",
                               os.path.basename(args.ckpt))
        params = ckpt.get("ema_params", ckpt.get("params"))
    else:
        params = model.init(jax.random.PRNGKey(0), dummy,
                            method=Unicorn.init_all)

    def fwd(params, images):
        raw, _ = model.apply(params, images, method=Unicorn.forward_whole)
        if args.mode == "decode":
            return decode_for_inference(raw, (8, 16, 32), mode="mot")
        return raw

    from jax import export as jexport

    exported = jexport.export(jax.jit(fwd))(
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params),
        jax.ShapeDtypeStruct(dummy.shape, dummy.dtype),
    )
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)/1e6:.1f} MB StableHLO to {args.out}")
    print("reload with: jax.export.deserialize(open(path,'rb').read()).call(...)")


if __name__ == "__main__":
    main()
