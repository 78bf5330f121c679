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

# test_size DELIBERATELY larger than the 64x96 fixture frames: the track.py
# eval paths must letterbox native-resolution frames to test_size and divide
# the output boxes back by the scale (round-5: tools/track.py fed raw frames
# to a letterbox-coordinate pipeline, invisible while the fixture resolution
# equaled test_size).
TRACK_EXP_SCALED = TRACK_EXP.replace("self.test_size = (64, 96)",
                                     "self.test_size = (96, 128)")

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
    """COCO-format video dataset: 1 video x 6 frames, one moving box.

    Frame resolution is DELIBERATELY not divisible by 32: any tool that
    forgets to letterbox native frames to test_size crashes in the FPN
    instead of silently mis-scaling (the round-5 tools/track.py bug)."""
    import cv2

    img_dir = os.path.join(datadir, "mot", "test", "v0")
    ann_dir = os.path.join(datadir, "mot", "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    H, W = 50, 70
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
    COCO-video fixture -> per-video MOT txt + CLEAR-MOT score printed.
    Uses TRACK_EXP_SCALED so native fixture resolution != test_size: the
    letterbox + scale-back path is exercised, not a no-op."""
    datadir = str(tmp_path / "data")
    _write_mot_fixture(datadir)
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP_SCALED)
    result_dir = str(tmp_path / "results")
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("track", ["-f", str(exp_file), "--result-dir", result_dir])

    out = capsys.readouterr().out
    txts = [f for f in os.listdir(result_dir) if f.endswith(".txt")]
    assert txts == ["v0.txt"]
    assert "mota" in out.lower() or "MOTA" in out


DET_EXP = '''
from unicorn_tpu.exp.det import ExpDet


class Exp(ExpDet):
    def __init__(self):
        super().__init__()
        self.exp_name = "cli_det_tiny"
        self.num_classes = 1
        self.backbone_name = "csp_darknet"
        self.depth = 0.33
        self.width = 0.25
        self.in_channels = [256, 512, 1024]
        self.use_attention = False
        self.n_layer_att = 0
        self.bf16 = False
        self.test_size = (64, 96)
        self.test_conf = 0.01
        self.nmsthre = 0.65
        self.val_ann = "val_tiny.json"
        self.val_name = "val"
'''


def _write_coco_fixture(datadir):
    """2-image COCO det fixture under <datadir>/coco/."""
    import cv2

    img_dir = os.path.join(datadir, "coco", "val")
    ann_dir = os.path.join(datadir, "coco", "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    H, W = 64, 96
    images, anns = [], []
    for i in range(2):
        img = np.zeros((H, W, 3), np.uint8)
        x, y, w, h = 20 + 10 * i, 15, 30, 30
        img[y:y + h, x:x + w] = 200
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i:06d}.jpg",
                       "height": H, "width": W})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
    with open(os.path.join(ann_dir, "val_tiny.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)


def test_eval_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/eval.py: det exp -> COCOEvaluator over an on-disk COCO fixture
    -> AP metrics printed (random weights; the wiring is what's under test)."""
    datadir = str(tmp_path / "data")
    _write_coco_fixture(datadir)
    exp_file = tmp_path / "exp_cli_det.py"
    exp_file.write_text(DET_EXP)
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("eval", ["-f", str(exp_file), "-b", "1"])

    out = capsys.readouterr().out
    assert "AP" in out


def test_demo_cli_image(tmp_path, monkeypatch):
    """tools/demo.py image: predict over a directory, write visualizations."""
    import cv2

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    img = np.zeros((48, 64, 3), np.uint8)
    img[10:40, 20:50] = 180
    cv2.imwrite(str(img_dir / "a.jpg"), img)
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP)
    save_dir = tmp_path / "out"

    _run_tool("demo", ["image", "-f", str(exp_file), "--path", str(img_dir),
                       "--save-dir", str(save_dir), "--conf", "0.0"])

    assert (save_dir / "a.jpg").exists()


def test_sot_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/test.py unicorn_sot: GOT-10k-layout fixture -> SOTDriver frame
    loop -> result txt + AUC report."""
    import cv2

    datadir = tmp_path / "data"
    seq_dir = datadir / "GOT10K" / "test" / "GOT-10k_Test_000001"
    seq_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    n_frames = 3
    for t in range(n_frames):
        img = (rng.rand(64, 96, 3) * 60).astype(np.uint8)
        img[20:44, 30 + 4 * t:54 + 4 * t] = 230
        cv2.imwrite(str(seq_dir / f"{t + 1:08d}.jpg"), img)
    gt = np.array([[30 + 4 * t, 20, 24, 24] for t in range(n_frames)], float)
    np.savetxt(seq_dir / "groundtruth.txt", gt, delimiter=",")
    (datadir / "GOT10K" / "test" / "list.txt").write_text(
        "GOT-10k_Test_000001\n")
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP)
    result_dir = tmp_path / "results"
    monkeypatch.setenv("UNICORN_DATADIR", str(datadir))

    _run_tool("test", ["unicorn_sot", "--dataset", "got10k_test",
                       "-f", str(exp_file), "--result-dir", str(result_dir)])

    out = capsys.readouterr().out
    written = []
    for root, _dirs, files in os.walk(result_dir):
        written += [f for f in files if f.endswith(".txt")]
    assert written, "no SOT result files written"
    assert "auc" in out.lower() or "success" in out.lower()


TRACK_MASK_EXP = '''
from unicorn_tpu.exp.track_mask import ExpTrackMask


class Exp(ExpTrackMask):
    def __init__(self):
        super().__init__()
        self.exp_name = "cli_mask_tiny"
        self.num_classes = 1
        self.backbone_name = "csp_darknet"
        self.depth = 0.33
        self.width = 0.25
        self.in_channels = [256, 512, 1024]
        self.interact_mode = "conv"
        self.n_layer_att = 0
        self.use_attention = False
        self.bf16 = False
        self.use_raft = False
        self.test_size = (64, 96)
        self.test_conf = 0.01
        self.nmsthre = 0.65
        self.pretrain_name = None
'''


def test_track_omni_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/track_omni.py (QDTrack embedding association) over the same
    COCO-video fixture as the ByteTrack path."""
    datadir = str(tmp_path / "data")
    _write_mot_fixture(datadir)
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP)
    result_dir = str(tmp_path / "results")
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("track_omni", ["-f", str(exp_file), "--result-dir", result_dir])

    assert sorted(os.listdir(result_dir)) == ["v0.txt"]


def test_vos_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/test.py unicorn_vos: DAVIS-layout fixture -> VOSDriver mask
    propagation -> indexed PNGs + J&F report."""
    import cv2

    datadir = tmp_path / "data"
    jdir = datadir / "DAVIS" / "JPEGImages" / "480p" / "seq0"
    adir = datadir / "DAVIS" / "Annotations" / "480p" / "seq0"
    sdir = datadir / "DAVIS" / "ImageSets" / "2017"
    jdir.mkdir(parents=True)
    adir.mkdir(parents=True)
    sdir.mkdir(parents=True)
    (sdir / "val.txt").write_text("seq0\n")
    rng = np.random.RandomState(0)
    for t in range(3):
        img = (rng.rand(64, 96, 3) * 60).astype(np.uint8)
        img[20:44, 30:60] = 220
        cv2.imwrite(str(jdir / f"{t:05d}.jpg"), img)
        mask = np.zeros((64, 96), np.uint8)
        mask[20:44, 30:60] = 1
        cv2.imwrite(str(adir / f"{t:05d}.png"), mask)
    exp_file = tmp_path / "exp_cli_mask.py"
    exp_file.write_text(TRACK_MASK_EXP)
    result_dir = tmp_path / "results"
    monkeypatch.setenv("UNICORN_DATADIR", str(datadir))

    _run_tool("test", ["unicorn_vos", "--dataset", "dv2017",
                       "-f", str(exp_file), "--result-dir", str(result_dir)])

    out = capsys.readouterr().out
    pngs = list((result_dir / "unicorn_vos" / "dv2017" / "seq0").glob("*.png"))
    assert len(pngs) == 3
    assert "J" in out or "jf" in out.lower()


def test_interpolation_cli(tmp_path):
    """tools/interpolation.py: DTI fills a 2-frame gap in a MOT txt for a
    long-enough track, and leaves short tracklets untouched (reference
    gates on n_frame > n_min and gap < n_dti, interpolation.py:82,92)."""
    txt_dir = tmp_path / "in"
    out_dir = tmp_path / "out"
    txt_dir.mkdir()
    rows = [[1, 7, 10, 10, 20, 20, 1, -1, -1, -1],
            [2, 7, 12, 10, 20, 20, 1, -1, -1, -1],
            [5, 7, 18, 10, 20, 20, 1, -1, -1, -1],
            [6, 7, 20, 10, 20, 20, 1, -1, -1, -1],
            # short 2-frame tracklet with the same gap: must NOT be filled
            [1, 9, 50, 10, 8, 8, 1, -1, -1, -1],
            [5, 9, 58, 10, 8, 8, 1, -1, -1, -1]]
    np.savetxt(txt_dir / "v0.txt", np.array(rows, float), delimiter=",")

    _run_tool("interpolation", ["--txt-dir", str(txt_dir),
                                "--out-dir", str(out_dir), "--n-min", "3"])

    out = np.loadtxt(out_dir / "v0.txt", delimiter=",")
    frames = sorted(out[out[:, 1] == 7][:, 0].astype(int).tolist())
    assert frames == [1, 2, 3, 4, 5, 6]  # frames 3-4 interpolated
    f3 = out[(out[:, 0] == 3) & (out[:, 1] == 7)][0]
    assert abs(f3[2] - 14.0) < 1e-6  # linear x between 12 (f2) and 18 (f5)
    assert f3[6] == 1.0 and f3[7] == -1.0  # synthesized-row conf stamping
    frames9 = sorted(out[out[:, 1] == 9][:, 0].astype(int).tolist())
    assert frames9 == [1, 5]  # n <= n_min: untouched


def test_analysis_results_cli(tmp_path, monkeypatch, capsys):
    """tools/analysis_results.py: AUC report from saved SOT result txts."""
    datadir = tmp_path / "data"
    seq_dir = datadir / "GOT10K" / "val" / "GOT-10k_Val_000001"
    seq_dir.mkdir(parents=True)
    import cv2

    gt = np.array([[30 + 2 * t, 20, 24, 24] for t in range(3)], float)
    np.savetxt(seq_dir / "groundtruth.txt", gt, delimiter=",")
    for t in range(3):
        cv2.imwrite(str(seq_dir / f"{t + 1:08d}.jpg"),
                    np.zeros((48, 64, 3), np.uint8))
    (datadir / "GOT10K" / "val" / "list.txt").write_text(
        "GOT-10k_Val_000001\n")
    result_dir = tmp_path / "results"
    result_dir.mkdir()
    np.savetxt(result_dir / "GOT-10k_Val_000001.txt", gt, delimiter="\t")
    monkeypatch.setenv("UNICORN_DATADIR", str(datadir))

    plot_path = tmp_path / "ope.png"
    _run_tool("analysis_results", ["--dataset", "got10k_val",
                                   "--result-dir", str(result_dir),
                                   "--plot", str(plot_path)])

    out = capsys.readouterr().out.lower()
    assert "auc" in out or "success" in out
    assert plot_path.exists() and plot_path.stat().st_size > 1000


def test_export_model_cli(tmp_path):
    """tools/export_model.py: StableHLO export of the jitted forward."""
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP)
    out_path = tmp_path / "model.stablehlo"

    _run_tool("export_model", ["-f", str(exp_file), "--out", str(out_path)])

    assert out_path.exists() and out_path.stat().st_size > 1000


def test_train_cli_end_to_end(tmp_path):
    """tools/train.py: exp file -> Trainer -> one tiny epoch -> checkpoint."""
    exp_file = tmp_path / "exp_cli_train.py"
    exp_file.write_text(TRAIN_EXP.replace("__OUTDIR__",
                                          str(tmp_path).replace("\\", "/")))
    _run_tool("train", ["-f", str(exp_file), "-b", "2"])
    assert os.path.exists(tmp_path / "cli_train_tiny" / "latest")


def test_launch_uni_stage_files_exist():
    """launch_uni.py's stage table must reference real config files."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "launch_uni", os.path.join(REPO, "launch_uni.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for model, stages in mod.STAGES.items():
        for stage, path in stages.items():
            assert os.path.exists(os.path.join(REPO, path)), (model, stage, path)


INST_EXP = '''
from unicorn_tpu.exp.det_mask import ExpDetMask


class Exp(ExpDetMask):
    def __init__(self):
        super().__init__()
        self.exp_name = "cli_inst_tiny"
        self.num_classes = 1
        self.backbone_name = "csp_darknet"
        self.depth = 0.33
        self.width = 0.25
        self.in_channels = [256, 512, 1024]
        self.use_attention = False
        self.n_layer_att = 0
        self.bf16 = False
        self.test_size = (64, 96)
        self.test_conf = 0.01
        self.nmsthre = 0.65
        self.val_ann = "val_tiny.json"
        self.val_name = "val"
        self.pretrain_name = None
'''


def test_eval_cli_inst_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/eval.py with an inst exp: CondInst mask decode path through
    drivers/inst.make_inst_forward -> COCOInstEvaluator (box + mask AP)."""
    import cv2

    from unicorn_tpu.evaluators import rle

    datadir = str(tmp_path / "data")
    img_dir = os.path.join(datadir, "coco", "val")
    ann_dir = os.path.join(datadir, "coco", "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    H, W = 64, 96
    images, anns = [], []
    for i in range(2):
        img = np.zeros((H, W, 3), np.uint8)
        x, y, w, h = 20 + 10 * i, 15, 30, 30
        img[y:y + h, x:x + w] = 200
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.jpg"), img)
        m = np.zeros((H, W), np.uint8)
        m[y:y + h, x:x + w] = 1
        images.append({"id": i + 1, "file_name": f"{i:06d}.jpg",
                       "height": H, "width": W})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                     "segmentation": rle.encode(m)})
    with open(os.path.join(ann_dir, "val_tiny.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    exp_file = tmp_path / "exp_cli_inst.py"
    exp_file.write_text(INST_EXP)
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("eval", ["-f", str(exp_file)])

    out = capsys.readouterr().out
    assert "AP" in out and "mask" in out.lower()


def test_demo_cli_video(tmp_path):
    """tools/demo.py video: read an on-disk clip, write the annotated one."""
    import cv2

    vid_path = str(tmp_path / "clip.avi")
    writer = cv2.VideoWriter(vid_path, cv2.VideoWriter_fourcc(*"MJPG"),
                             10, (64, 48))
    rng = np.random.RandomState(0)
    for _ in range(4):
        frame = (rng.rand(48, 64, 3) * 80).astype(np.uint8)
        frame[10:40, 20:50] = 200
        writer.write(frame)
    writer.release()
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP)
    save_dir = tmp_path / "out"

    _run_tool("demo", ["video", "-f", str(exp_file), "--path", vid_path,
                       "--save-dir", str(save_dir), "--conf", "0.0"])

    out_file = save_dir / "demo_out.mp4"
    assert out_file.exists() and out_file.stat().st_size > 0


def test_track_cli_fused_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/track.py --fused: the fully on-device serving pipeline
    (device NMS + jax ByteTrack over lax.scan chunks) over the same
    fixture, with video-boundary reset and final-chunk padding."""
    datadir = str(tmp_path / "data")
    _write_mot_fixture(datadir)
    exp_file = tmp_path / "exp_cli_tiny.py"
    exp_file.write_text(TRACK_EXP_SCALED)
    result_dir = str(tmp_path / "results")
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("track", ["-f", str(exp_file), "--result-dir", result_dir,
                        "--fused", "--chunk", "4", "--track-thresh", "0.3"])

    out = capsys.readouterr().out
    assert sorted(os.listdir(result_dir)) == ["v0.txt"]
    assert "mota" in out.lower() or "MOTA" in out


def test_track_omni_mots_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """tools/track_omni.py --mots: QDTrack association + CondInst masks ->
    MOTS-Challenge txt whose RLEs decode at the ORIGINAL image resolution,
    are per-frame disjoint, carry the class-2000 id encoding, and keep a
    stable id across frames (the round-4 misalignment bug class cannot pass
    these silently)."""
    datadir = str(tmp_path / "data")
    _write_mot_fixture(datadir)
    exp_file = tmp_path / "exp_cli_mask.py"
    exp_file.write_text(TRACK_MASK_EXP.replace(
        'self.test_size = (64, 96)',
        'self.test_size = (64, 96)\n        self.test_ann = "test_tiny.json"\n'
        '        self.test_name = "test"'))
    result_dir = str(tmp_path / "results")
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    _run_tool("track_omni", ["-f", str(exp_file), "--mots",
                             "--result-dir", result_dir])

    from unicorn_tpu.evaluators import rle as rle_codec
    from unicorn_tpu.evaluators.mots_metrics import load_mots_txt

    assert sorted(os.listdir(result_dir)) == ["v0.txt"]
    frames = load_mots_txt(os.path.join(result_dir, "v0.txt"))
    # fixture is 6 frames; untrained weights may not fire on every frame,
    # but the format contract holds on whatever was emitted
    ids_seen = set()
    for fid, ids, clss, rles in frames:
        assert all(c == 2 for c in clss)
        assert all(i >= 2000 for i in ids)
        ids_seen.update(ids)
        total = None
        for r in rles:
            m = rle_codec.decode(r)
            assert m.shape == (64, 96)  # original image resolution
            total = m.astype(np.int32) if total is None else total + m
        if total is not None:
            assert total.max() <= 1, "per-frame masks must be disjoint"

    # --score-gt: self-score the written results (deterministic rerun) —
    # the CLI-level sMOTSA path; perfect agreement when any masks exist
    import shutil

    gt_dir = tmp_path / "mots_gt"
    os.makedirs(gt_dir)
    shutil.copy(os.path.join(result_dir, "v0.txt"), gt_dir / "v0.txt")
    result_dir2 = str(tmp_path / "results2")
    _run_tool("track_omni", ["-f", str(exp_file), "--mots",
                             "--result-dir", result_dir2,
                             "--score-gt", str(gt_dir)])
    scores = json.load(open(os.path.join(result_dir2, "mots_scores.json")))
    n_masks = sum(len(f[1]) for f in frames)
    if n_masks:
        assert scores["sMOTSA"] > 0.999 and scores["IDsw"] == 0, scores
    out = capsys.readouterr().out
    assert "sMOTSA=" in out


def test_get_evaluator_mesh_kwarg_compat():
    """tools/eval.py passes mesh= to every exp's get_evaluator; lock the
    signature so a uni/track exp cannot regress to TypeError (ADVICE r2)."""
    import inspect

    from unicorn_tpu.exp.det import ExpDet
    from unicorn_tpu.exp.det_mask import ExpDetMask
    from unicorn_tpu.exp.track import ExpTrack
    from unicorn_tpu.exp.track_mask import ExpTrackMask

    for cls in (ExpDet, ExpDetMask, ExpTrack, ExpTrackMask):
        sig = inspect.signature(cls.get_evaluator)
        assert "mesh" in sig.parameters, cls.__name__


def _stub_trainer(tmp_path, exp, model, params):
    """Duck-typed stand-in carrying exactly the attributes
    Trainer.evaluate_and_save_best reads; returns (stub, saved_names)."""
    import logging

    import optax

    from unicorn_tpu.core.train_state import TrainState

    class Stub:
        pass

    t = Stub()
    t.exp = exp
    t.model = model
    t.state = TrainState.create(params, optax.sgd(1e-4), use_ema=False)
    t.logger = logging.getLogger("test")
    t.best_ap = -1.0
    t.epoch = 0
    t.output_dir = str(tmp_path / "out")
    os.makedirs(t.output_dir, exist_ok=True)
    t._log_metrics = lambda rec: None
    saved = []
    t.save_ckpt = lambda name: saved.append(name)
    return t, saved


def test_trainer_in_training_eval_inst_exp(tmp_path, monkeypatch, capsys):
    """Trainer.evaluate_and_save_best with a mask exp: the COCOInstEvaluator
    needs the inst forward ((dets, valid, masks)), not the det decode —
    regression for the silent in-training-eval breakage (r3 review)."""
    import cv2
    import jax

    from unicorn_tpu.core.trainer import Trainer
    from unicorn_tpu.evaluators import rle
    from unicorn_tpu.exp.base import get_exp

    datadir = str(tmp_path / "data")
    img_dir = os.path.join(datadir, "coco", "val")
    ann_dir = os.path.join(datadir, "coco", "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    H, W = 64, 96
    images, anns = [], []
    for i in range(2):
        img = np.zeros((H, W, 3), np.uint8)
        x, y, w, h = 20 + 10 * i, 15, 30, 30
        img[y:y + h, x:x + w] = 200
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.jpg"), img)
        m = np.zeros((H, W), np.uint8)
        m[y:y + h, x:x + w] = 1
        images.append({"id": i + 1, "file_name": f"{i:06d}.jpg",
                       "height": H, "width": W})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0,
                     "segmentation": rle.encode(m)})
    with open(os.path.join(ann_dir, "val_tiny.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    exp_file = tmp_path / "exp_cli_inst.py"
    exp_file.write_text(INST_EXP)
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    exp = get_exp(str(exp_file))
    model = exp.get_model()
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, H, W, 3), np.float32))
    t, saved = _stub_trainer(tmp_path, exp, model, params)

    Trainer.evaluate_and_save_best(t)   # must not raise
    assert saved == ["best"]            # ap >= 0 beats the -1 sentinel


def test_trainer_in_training_eval_track_exp(tmp_path, monkeypatch):
    """Trainer.evaluate_and_save_best with a uni/track exp: runs a COCO box
    eval over the MOT val set (get_trainer_evaluator — reference
    unicorn_track.py:402-443 role), NOT the MOT-metrics evaluator whose
    evaluate() has a different contract (r3 review)."""
    import cv2
    import jax

    from unicorn_tpu.core.trainer import Trainer
    from unicorn_tpu.exp.base import get_exp
    from unicorn_tpu.models.unicorn import Unicorn

    datadir = str(tmp_path / "data")
    img_dir = os.path.join(datadir, "mot", "test")
    ann_dir = os.path.join(datadir, "mot", "annotations")
    os.makedirs(img_dir)
    os.makedirs(ann_dir)
    H, W = 64, 96
    images, anns = [], []
    for i in range(2):
        img = np.zeros((H, W, 3), np.uint8)
        x, y, w, h = 20 + 10 * i, 15, 30, 30
        img[y:y + h, x:x + w] = 200
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.jpg"), img)
        images.append({"id": i + 1, "file_name": f"{i:06d}.jpg",
                       "height": H, "width": W})
        anns.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                     "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0})
    with open(os.path.join(ann_dir, "test_tiny.json"), "w") as f:
        json.dump({"images": images, "annotations": anns,
                   "categories": [{"id": 1, "name": "person"}]}, f)
    exp_file = tmp_path / "exp_cli_track.py"
    exp_file.write_text(TRACK_EXP)
    monkeypatch.setenv("UNICORN_DATADIR", datadir)

    exp = get_exp(str(exp_file))
    model = exp.get_model()
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, H, W, 3), np.float32),
                        method=Unicorn.init_all)
    t, saved = _stub_trainer(tmp_path, exp, model, params)

    Trainer.evaluate_and_save_best(t)   # must not raise
    assert saved == ["best"]
