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
    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()  # persistent compile cache: TPU graphs compile
    # through a slow remote queue; .jax_cache makes reruns instant

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
        from unicorn_tpu.drivers.vos import VOSDriver
        from unicorn_tpu.harness.davis_metrics import evaluate_davis
        from unicorn_tpu.harness.running import (
            run_dataset_vos_parallel, run_sequence_vos,
        )
        from unicorn_tpu.utils.label_ops import read_indexed_mask

        n = len(sequences) if args.max_seqs is None else args.max_seqs
        # size the driver's object slots from the data: DAVIS 2017 has
        # 5-object sequences, YT-VOS more — silently truncating at a fixed
        # K would zero those objects' J&F (VOSDriver raises on overflow)
        gt_by_seq = {
            seq.name: [read_indexed_mask(m) for m in seq.masks]
            for seq in sequences[:n]
        }
        max_objs = max((len({int(i) for g in gts for i in np.unique(g)
                             if i != 0})
                        for gts in gt_by_seq.values()), default=1)

        def make_driver():
            return VOSDriver(model, params, exp.test_size,
                             max_objects=max(1, max_objs),
                             use_raft=getattr(exp, "use_raft", False),
                             up_rate=getattr(exp, "up_rate", 8))
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
        # align preds to the ANNOTATED frames by name: YT-VOS valid ships
        # sparse Annotations (first-appearance frames only), so positional
        # preds[t] vs gts[t] would score the wrong frames there
        def _stem(p):
            return os.path.splitext(os.path.basename(p))[0]

        gts, preds_aligned = {}, {}
        for seq in sequences[:n]:
            if seq.name not in preds:
                continue
            frame_idx = {_stem(p): i for i, p in enumerate(seq.frames)}
            sel = [(frame_idx[_stem(m)], g)
                   for m, g in zip(seq.masks, gt_by_seq[seq.name])
                   if _stem(m) in frame_idx]
            gts[seq.name] = [g for _, g in sel]
            preds_aligned[seq.name] = [preds[seq.name][i] for i, _ in sel]
        print(evaluate_davis(preds_aligned, gts))


if __name__ == "__main__":
    main()
