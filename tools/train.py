"""Training entry point (reference tools/train.py).

Single-controller jax: no process launcher (unicorn/core/launch.py has no
equivalent here by design — XLA + the data mesh replace per-GPU processes).

Usage:
  python tools/train.py -f exps/default/unicorn_track_tiny.py -b 16 [--resume]
  python tools/train.py -n unicorn_det_convnext_tiny_800x1280 -b 64
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    parser = argparse.ArgumentParser("unicorn_tpu train")
    parser.add_argument("-f", "--exp_file", default=None, type=str)
    parser.add_argument("-n", "--name", default=None, type=str)
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("-c", "--ckpt", default=None, type=str,
                        help="checkpoint path: with --resume, resume from it "
                             "instead of <output>/latest; without, load its "
                             "params for fine-tuning (reference "
                             "trainer.py:466-501 resume_train semantics)")
    parser.add_argument("--start_epoch", default=None, type=int,
                        help="override the resumed start epoch "
                             "(reference args.start_epoch)")
    parser.add_argument("--seed", default=None, type=int)
    parser.add_argument("opts", nargs=argparse.REMAINDER,
                        help="exp config overrides: key value ...")
    return parser


def main():
    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()  # persistent compile cache: TPU graphs compile
    # through a slow remote queue; .jax_cache makes reruns instant

    args = make_parser().parse_args()
    from unicorn_tpu.core.trainer import Trainer
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.parallel.multihost import initialize_multihost

    # multi-host pods: wires jax.distributed so jax.devices() spans the pod
    # (no-op on a single host; reference tools/train_dist.py role)
    initialize_multihost()

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    if args.seed is not None:
        exp.seed = args.seed
    trainer = Trainer(exp, {"batch_size": args.batch_size,
                            "resume": args.resume, "ckpt": args.ckpt,
                            "start_epoch": args.start_epoch})
    trainer.train()


if __name__ == "__main__":
    main()
