"""COCO detection / instance-seg evaluation (reference tools/eval.py).

Usage:
  python tools/eval.py -f exps/default/unicorn_det_convnext_tiny_800x1280.py \
      -c Unicorn_outputs/<exp>/best [--max-images N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("unicorn_tpu eval")
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("-b", "--batch-size", type=int, default=4)
    p.add_argument("--max-images", type=int, default=None)
    p.add_argument("--conf", type=float, default=None)
    p.add_argument("--nms", type=float, default=None)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    return p


def main():
    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()  # persistent compile cache: TPU graphs compile
    # through a slow remote queue; .jax_cache makes reruns instant

    args = make_parser().parse_args()
    import jax

    from unicorn_tpu.core.checkpoint import load_checkpoint
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.models.heads import decode_for_inference

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.conf is not None:
        exp.test_conf = args.conf
    if args.nms is not None:
        exp.nmsthre = args.nms

    model = exp.get_model()
    # shard eval batches over all chips (reference distributed eval role);
    # det only — the inst mask decode is a batch-1 path
    mesh = None
    n_dev = len(jax.devices())
    if n_dev > 1 and args.batch_size % n_dev == 0 \
            and getattr(exp, "task", "det") == "det":
        import numpy as _np
        from jax.sharding import Mesh

        mesh = Mesh(_np.asarray(jax.devices()), ("data",))
    evaluator = exp.get_evaluator(batch_size=args.batch_size, mesh=mesh)
    if args.ckpt:
        ckpt = load_checkpoint(os.path.dirname(args.ckpt) or ".",
                               os.path.basename(args.ckpt))
        params = ckpt.get("ema_params", ckpt.get("params"))
    else:
        import jax.numpy as jnp
        import numpy as np

        dummy = jnp.asarray(np.zeros((1, *exp.test_size, 3), np.float32))
        params = model.init(jax.random.PRNGKey(0), dummy)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        params = jax.device_put(params, NamedSharding(mesh, P()))

    if getattr(exp, "task", "det") == "inst":
        # box + mask AP through the CondInst mask decode path
        forward = exp.get_inst_forward(model)
        metrics = evaluator.evaluate(forward, params,
                                     max_images=args.max_images)
        print(metrics)
        return

    @jax.jit
    def forward(params, images):
        raw = model.apply(params, images)
        if isinstance(raw, tuple):
            raw = raw[0]
        return decode_for_inference(raw, (8, 16, 32), mode="mot")

    metrics = evaluator.evaluate(forward, params, max_images=args.max_images)
    print(metrics)


if __name__ == "__main__":
    main()
