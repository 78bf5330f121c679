"""CLI end-to-end smokes: the actual tools/ entry points, driven in-process
with patched argv, against on-disk fixtures.

These close the last untested seam — everything below the CLIs is covered by
unit/e2e tests, but an import or arg-wiring regression in tools/train.py or
tools/track.py would otherwise go unnoticed until a real run.
"""
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRACK_EXP = '''
from unicorn_tpu.exp.track import ExpTrack


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = "cli_tiny"
        self.num_classes = 1
        self.backbone_name = "csp_darknet"
        self.depth = 0.33
        self.width = 0.25
        self.in_channels = [256, 512, 1024]
        self.interact_mode = "conv"
        self.n_layer_att = 0
        self.use_attention = False
        self.bf16 = False
        self.test_size = (64, 96)
        self.test_conf = 0.01
        self.nmsthre = 0.65
        self.test_ann = "test_tiny.json"
        self.test_name = "test"
        self.pretrain_name = None
'''

TRAIN_EXP = '''
import numpy as np

from unicorn_tpu.exp.track import ExpTrack


class FakeSOT:
    def __init__(self):
        self.rng = np.random.RandomState(0)

    def __len__(self):
        return 20

    def pull_item_omni(self, seq_id, num_frames=2):
        out = []
        for _ in range(num_frames):
            img = (self.rng.rand(48, 56, 3) * 255).astype(np.uint8)
            res = np.array([[10, 10, 40, 40, 0]], np.float32)
            out.append((img, res))
        return out


class FakeMOT(FakeSOT):
    def pull_item_omni(self, seq_id, num_frames=2):
        out = []
        for _ in range(num_frames):
            img = (self.rng.rand(48, 56, 3) * 255).astype(np.uint8)
            res = np.array([[10, 10, 30, 30, 0, 1]], np.float32)
            out.append((img, res))
        return out


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = "cli_train_tiny"
        self.output_dir = "__OUTDIR__"
        self.backbone_name = "csp_darknet"
        self.depth = 0.33
        self.width = 0.25
        self.in_channels = [256, 512, 1024]
        self.interact_mode = "conv"
        self.n_layer_att = 0
        self.use_attention = False
        self.bf16 = False
        self.input_size = (64, 64)
        self.max_labels = 5
        self.samples_per_epoch = 4
        self.max_epoch = 1
        self.multiscale_range = 0
        self.ema = True
        self.use_grad_acc = False
        self.eval_interval = 100
        self.print_interval = 2
        self.pretrain_name = None

    def get_dataset(self, **kw):
        from unicorn_tpu.data.datasets.omni import OmniDataset, OmniDatasetPlus

        sot = OmniDataset([FakeSOT()], samples_per_epoch=2)
        mot = OmniDataset([FakeMOT()], samples_per_epoch=2)
        return OmniDatasetPlus(sot, mot, 4, mode="alter")
'''


def _run_tool(tool, argv):
    """Import tools/<tool>.py fresh and run main() with patched sys.argv."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        f"cli_{tool}", os.path.join(REPO, "tools", f"{tool}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = [f"{tool}.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def _write_mot_fixture(datadir):
    """COCO-format video dataset: 1 video x 6 frames, one moving box."""
    import cv2

    img_dir = os.path.join(datadir, "mot", "test", "v0")
    ann_dir = os.path.join(datadir, "mot", "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    H, W = 64, 96
    images, anns = [], []
    for t in range(6):
        img = np.zeros((H, W, 3), np.uint8)
        x, y, w, h = 10 + 4 * t, 20, 24, 24
        img[y:y + h, x:x + w] = 255
        cv2.imwrite(os.path.join(img_dir, f"{t:06d}.jpg"), img)
        images.append({"id": t + 1, "file_name": f"v0/{t:06d}.jpg",
                       "height": H, "width": W, "frame_id": t + 1,
                       "video_id": 1})
        anns.append({"id": t + 1, "image_id": t + 1, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                     "track_id": 1})
    with open(os.path.join(ann_dir, "test_tiny.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)


def test_track_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/track.py: exp file -> model -> streaming eval over an on-disk
    COCO-video fixture -> per-video MOT txt + CLEAR-MOT score printed."""
    datadir = str(tmp_path / "data")
    _write_mot_fixture(datadir)
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP)
    result_dir = str(tmp_path / "results")
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("track", ["-f", str(exp_file), "--result-dir", result_dir])

    out = capsys.readouterr().out
    txts = [f for f in os.listdir(result_dir) if f.endswith(".txt")]
    assert txts == ["v0.txt"]
    assert "mota" in out.lower() or "MOTA" in out


def test_train_cli_end_to_end(tmp_path):
    """tools/train.py: exp file -> Trainer -> one tiny epoch -> checkpoint."""
    exp_file = tmp_path / "exp_cli_train.py"
    exp_file.write_text(TRAIN_EXP.replace("__OUTDIR__",
                                          str(tmp_path).replace("\\", "/")))
    _run_tool("train", ["-f", str(exp_file), "-b", "2"])
    assert os.path.exists(tmp_path / "cli_train_tiny" / "latest")
