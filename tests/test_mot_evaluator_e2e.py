"""MOT evaluator end-to-end: a mock detector emitting gt boxes through the
real evaluate loop (letterbox coords, per-video tracker resets, txt writing)
must score MOTA == 1.0. Also: SOT analysis sanity (gt results -> AUC 1)."""
import os

import jax.numpy as jnp
import numpy as np

from unicorn_tpu.evaluators.mot_evaluator import MOTEvaluator
from unicorn_tpu.harness.analysis import evaluate_sot


class FakeMOTDataset:
    """Two synthetic videos with 3 moving objects each."""

    img_size = (64, 64)

    def __init__(self, n_videos=2, n_frames=10, hw=(48, 56)):
        self.hw = hw
        self.items = []
        self.gt = {}
        rng = np.random.RandomState(0)
        for v in range(n_videos):
            name = f"vid{v}"
            pos = rng.uniform(5, 25, (3, 2))
            vel = rng.uniform(-0.5, 1.0, (3, 2))
            size = rng.uniform(8, 14, (3, 2))
            frames = []
            for t in range(n_frames):
                boxes = np.concatenate([pos + t * vel, pos + t * vel + size], 1)
                self.items.append((v, t + 1, boxes.copy()))
                frames.append((t + 1, [1, 2, 3],
                               [(b[0], b[1], b[2] - b[0], b[3] - b[1])
                                for b in boxes]))
            self.gt[name] = frames

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        v, frame_id, boxes = self.items[i]
        h, w = self.hw
        img = np.zeros((h, w, 3), np.float32)
        info = (h, w, frame_id, v, f"vid{v}/img1/{frame_id:06d}.jpg")
        return img, boxes, info, np.array([i])


def test_mot_evaluate_perfect_tracks(tmp_path):
    ds = FakeMOTDataset()
    r = min(ds.img_size[0] / ds.hw[0], ds.img_size[1] / ds.hw[1])

    lookup = {}
    for i, (v, f, boxes) in enumerate(ds.items):
        lookup[i] = boxes
    counter = {"i": 0}

    def step_fn(params, frame):
        boxes = lookup[counter["i"]]
        counter["i"] += 1
        dets = np.zeros((8, 7), np.float32)
        n = len(boxes)
        dets[:n, :4] = boxes * r        # letterbox coords
        dets[:n, 4] = 0.95
        dets[:n, 5] = 0.95
        valid = np.zeros((8,), bool)
        valid[:n] = True
        return jnp.asarray(dets), jnp.asarray(valid)

    ev = MOTEvaluator(dataset=ds, track_thresh=0.5, min_box_area=1)
    # relax the aspect-ratio filter for synthetic square-ish boxes
    results = ev.evaluate(step_fn, None, result_dir=str(tmp_path))
    assert set(results) == {"vid0", "vid1"}
    assert os.path.exists(os.path.join(str(tmp_path), "vid0.txt"))

    metrics = MOTEvaluator.score(results, ds.gt)
    assert metrics["MOTA"] > 0.9, metrics
    assert metrics["IDsw"] == 0
    assert metrics["IDF1"] > 0.9


def test_sot_analysis_gt_gives_auc1():
    rng = np.random.RandomState(0)
    gts = {f"seq{i}": rng.uniform(10, 200, (30, 4)) for i in range(3)}
    m = evaluate_sot({k: v.copy() for k, v in gts.items()}, gts)
    # OTB convention counts iou > t (strict): the t=1.0 bin is float-noise
    # for exact boxes, so the ceiling is ~20/21
    assert m["AUC"] > 0.95
    assert m["n_sequences"] == 3
