"""Host input-pipeline throughput benchmark (VERDICT r2 item 5).

Measures UniLoader samples/s for the 2-frame uni task at a given input size
with full augmentation on (TrainTransformOmni: HSV jitter, flip, letterbox,
fixed-slot label padding), over a synthetic in-memory sub-dataset — isolating
transform + batch-assembly cost from disk/decode.

The number that matters: at the measured TPU train step of ~130 ms/sample
(B=4 + remat, README), the host must sustain ~7.7 samples/s per chip.
Run: python tools/loader_bench.py [HxW] [seconds]
Prints one JSON line {"samples_per_s": ..., "ms_per_sample": ...}.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class SyntheticSeqDataset:
    """pull_item_omni-style source: random uint8 frames + a few boxes, held
    in memory (decode excluded — the reference prefetcher benchmarks the same
    boundary, unicorn/data/data_prefetcher.py:15-173)."""

    def __init__(self, n_seqs=8, hw=(1080, 1920), n_obj=8, seed=0):
        rng = np.random.RandomState(seed)
        self.frames = [
            (rng.rand(hw[0], hw[1], 3) * 255).astype(np.uint8)
            for _ in range(n_seqs)
        ]
        self.hw = hw
        self.n_obj = n_obj

    def __len__(self):
        return len(self.frames)

    def pull_item(self, index):
        import random

        h, w = self.hw
        out = []
        for _ in range(2):
            img = self.frames[random.randrange(len(self.frames))]
            res = np.zeros((self.n_obj, 6), np.float32)
            for k in range(self.n_obj):
                x1, y1 = random.uniform(0, w - 200), random.uniform(0, h - 200)
                res[k] = [x1, y1, x1 + random.uniform(30, 180),
                          y1 + random.uniform(30, 180), 0, k]
            out.append((img, res))
        return out


def main():
    hw = (sys.argv[1] if len(sys.argv) > 1 else "800x1280").split("x")
    H, W = int(hw[0]), int(hw[1])
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    B = int(os.environ.get("LOADER_BENCH_BS", "4"))

    from unicorn_tpu.data.datasets.omni import OmniDatasetPlus
    from unicorn_tpu.data.loader import UniLoader
    from unicorn_tpu.data.transforms import TrainTransformOmni

    ds = OmniDatasetPlus(sot_dataset=SyntheticSeqDataset(),
                         mot_dataset=SyntheticSeqDataset(seed=1),
                         mode="alter")
    loader = UniLoader(ds, TrainTransformOmni(max_labels=120, flip_prob=0.5,
                                              hsv_prob=1.0),
                       B, (H, W), alter_every=1)
    it = iter(loader)
    next(it)  # warm (first batch pays one-time numpy/cv2 init)
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        next(it)
        n += B
    dt = time.perf_counter() - t0
    loader.stop()
    print(json.dumps({
        "metric": "uni_loader_samples_per_s",
        "input": f"{H}x{W}", "batch_size": B,
        "samples_per_s": round(n / dt, 2),
        "ms_per_sample": round(1000 * dt / n, 2),
    }))


if __name__ == "__main__":
    main()
