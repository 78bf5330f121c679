"""SOT/VOS test dispatcher (reference tools/test.py + external/lib harness).

Usage:
  python tools/test.py unicorn_sot --dataset lasot -f <exp> -c <ckpt>
  python tools/test.py unicorn_vos --dataset dv2017 -f <exp> -c <ckpt>
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser():
    p = argparse.ArgumentParser("unicorn_tpu SOT/VOS test")
    p.add_argument("tracker", choices=["unicorn_sot", "unicorn_vos"])
    p.add_argument("--dataset", default="lasot")
    p.add_argument("-f", "--exp_file", default=None)
    p.add_argument("-n", "--name", default=None)
    p.add_argument("-c", "--ckpt", default=None)
    p.add_argument("--result-dir", default="test_results")
    p.add_argument("--max-seqs", type=int, default=None)
    p.add_argument("--parallel-seqs", type=int, default=0,
                   help="run N sequences in lockstep over an N-device "
                        "'seq' mesh, one sequence per chip (SOT and VOS; "
                        "harness.running.run_dataset_{sot,vos}_parallel)")
    # NOT argparse.REMAINDER: with a leading positional (tracker name)
    # REMAINDER swallows every following option (see tools/demo.py).
    p.add_argument("opts", nargs="*")
    return p


def main():
    args = make_parser().parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unicorn_tpu.core.checkpoint import load_checkpoint
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.harness.datasets import get_dataset
    from unicorn_tpu.models.unicorn import Unicorn

    exp = get_exp(args.exp_file, args.name)
    exp.merge(args.opts)
    model = exp.get_model()
    if getattr(exp, "serve_interact_bf16", False):
        model = model.clone(interact_dtype=jnp.bfloat16)
    if args.ckpt:
        ckpt = load_checkpoint(os.path.dirname(args.ckpt) or ".",
                               os.path.basename(args.ckpt))
        params = ckpt.get("ema_params", ckpt.get("params"))
    else:
        dummy = jnp.asarray(np.zeros((1, *exp.test_size, 3), np.float32))
        params = model.init(jax.random.PRNGKey(0), dummy,
                            method=Unicorn.init_all)

    sequences = get_dataset(args.dataset)
    if not sequences:
        print(f"dataset {args.dataset} not found under UNICORN_DATADIR")
        return
    result_dir = os.path.join(args.result_dir, args.tracker, args.dataset)

    if args.tracker == "unicorn_sot":
        from unicorn_tpu.drivers.sot import SOTDriver
        from unicorn_tpu.harness.analysis import evaluate_sot
        from unicorn_tpu.harness.running import (
            run_dataset_sot, run_dataset_sot_parallel,
        )

        if args.parallel_seqs > 1:
            from jax.sharding import Mesh

            mesh = Mesh(np.asarray(jax.devices()[:args.parallel_seqs]),
                        ("seq",))
            results = run_dataset_sot_parallel(
                SOTDriver(model, params, exp.test_size), sequences, mesh,
                result_dir=result_dir, max_seqs=args.max_seqs)
        else:
            results = run_dataset_sot(
                lambda: SOTDriver(model, params, exp.test_size),
                sequences, result_dir, max_seqs=args.max_seqs)
        gts = {s.name: s.ground_truth_rect for s in sequences
               if len(s.ground_truth_rect) > 1}
        if gts:
            print(evaluate_sot(results, gts))
    else:
        import cv2

        from unicorn_tpu.drivers.vos import VOSDriver
        from unicorn_tpu.harness.davis_metrics import evaluate_davis
        from unicorn_tpu.harness.running import (
            run_dataset_vos_parallel, run_sequence_vos,
        )

        def make_driver():
            return VOSDriver(model, params, exp.test_size,
                             use_raft=getattr(exp, "use_raft", False),
                             up_rate=getattr(exp, "up_rate", 8))

        n = len(sequences) if args.max_seqs is None else args.max_seqs
        if args.parallel_seqs > 1:
            from jax.sharding import Mesh

            mesh = Mesh(np.asarray(jax.devices()[:args.parallel_seqs]),
                        ("seq",))
            preds = run_dataset_vos_parallel(
                make_driver(), sequences, mesh, result_dir=result_dir,
                max_seqs=args.max_seqs)
        else:
            preds = {}
            for seq in sequences[:n]:
                preds[seq.name] = run_sequence_vos(make_driver(), seq,
                                                   result_dir)
                print(f"{seq.name}: {len(preds[seq.name])} frames")
        gts = {seq.name: [cv2.imread(m, cv2.IMREAD_GRAYSCALE)
                          for m in seq.masks]
               for seq in sequences[:n] if seq.name in preds}
        print(evaluate_davis(preds, gts))


if __name__ == "__main__":
    main()
