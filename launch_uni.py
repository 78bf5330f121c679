"""Top-level multi-stage training launcher.

Reference: launch_uni.py (runs the det -> track -> mask pipeline with
--resume). Single-controller jax: stages run sequentially in one process;
each stage auto-resumes from its latest checkpoint and the next stage picks
up the previous stage's weights via the exp's load_pretrained surgery.

Usage:
  python launch_uni.py --stage all --model tiny -b 16
  python launch_uni.py --stage track --model large -b 16
"""
import argparse
import subprocess
import sys

STAGES = {
    "tiny": {
        "det": "exps/default/unicorn_det_convnext_tiny_800x1280.py",
        "inst": "exps/default/unicorn_inst_convnext_tiny_800x1280.py",
        "track": "exps/default/unicorn_track_tiny.py",
        "mask": "exps/default/unicorn_track_tiny_mask.py",
    },
    "large": {
        "det": "exps/default/unicorn_det_convnext_large_800x1280.py",
        "track": "exps/default/unicorn_track_large.py",
        "mask": "exps/default/unicorn_track_large_mask.py",
    },
    "r50": {
        "det": "exps/default/unicorn_det_r50_800x1280.py",
        "track": "exps/default/unicorn_track_r50.py",
        "mask": "exps/default/unicorn_track_r50_mask.py",
    },
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny", choices=sorted(STAGES))
    p.add_argument("--stage", default="all",
                   choices=["all", "det", "inst", "track", "mask"])
    p.add_argument("-b", "--batch-size", type=int, default=16)
    args = p.parse_args()

    stages = STAGES[args.model]
    order = [args.stage] if args.stage != "all" else \
        [s for s in ("det", "inst", "track", "mask") if s in stages]
    for stage in order:
        cmd = [sys.executable, "tools/train.py", "-f", stages[stage],
               "-b", str(args.batch_size), "--resume"]
        print("launching:", " ".join(cmd))
        ret = subprocess.call(cmd)
        if ret != 0:
            sys.exit(ret)


if __name__ == "__main__":
    main()
