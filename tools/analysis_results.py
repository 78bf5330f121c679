"""SOT result analysis CLI (reference tools/analysis_results.py): reads saved
per-sequence txt results, scores AUC / precision vs dataset gt.

Usage: python tools/analysis_results.py --dataset lasot --result-dir test_results/unicorn_sot/lasot
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="lasot")
    p.add_argument("--result-dir", required=True)
    p.add_argument("--plot", default=None,
                   help="save success/precision plots to this PNG path")
    args = p.parse_args()

    from unicorn_tpu.harness.analysis import evaluate_sot, plot_results
    from unicorn_tpu.harness.datasets import get_dataset

    sequences = get_dataset(args.dataset)
    gts = {s.name: s.ground_truth_rect for s in sequences
           if len(s.ground_truth_rect) > 1}
    results = {}
    for f in os.listdir(args.result_dir):
        if f.endswith(".txt"):
            results[f[:-4]] = np.loadtxt(
                os.path.join(args.result_dir, f), delimiter="\t")
    print(evaluate_sot(results, gts))
    if args.plot:
        plot_results({"unicorn_tpu": results}, gts, args.plot,
                     title=args.dataset)
        print(f"plots saved to {args.plot}")


if __name__ == "__main__":
    main()
