"""Data pipeline tests: letterbox, transforms, mosaic wrapper."""
import numpy as np

from unicorn_tpu.data.mosaic import MosaicDetection
from unicorn_tpu.data.preproc import letterbox
from unicorn_tpu.data.transforms import TrainTransform, TrainTransformOmni, ValTransform


class FakeDetDataset:
    """In-memory detection dataset with one centered box per image."""

    def __init__(self, n=10, h=120, w=160, seed=0):
        self.rng = np.random.RandomState(seed)
        self.n = n
        self.h, self.w = h, w

    def __len__(self):
        return self.n

    def pull_item(self, idx):
        img = (self.rng.rand(self.h, self.w, 3) * 255).astype(np.uint8)
        res = np.array([[20, 30, 80, 90, idx % 5]], np.float32)  # xyxy cls
        return img, res, (self.h, self.w), np.array([idx])


def test_letterbox_scale_and_padding():
    img = np.full((100, 200, 3), 50, np.uint8)
    out, r = letterbox(img, (128, 128))
    assert out.shape == (128, 128, 3)
    assert abs(r - 128 / 200) < 1e-9
    # content occupies top rows, padding is 114
    assert (out[:64, :, :] == 50).all()
    assert (out[70:, :, :] == 114).all()


def test_train_transform_label_format():
    ds = FakeDetDataset()
    tf = TrainTransform(max_labels=10, flip_prob=0.0, hsv_prob=0.0)
    img, res, _, _ = ds.pull_item(3)
    out_img, labels = tf(img, res, (128, 128))
    assert out_img.shape == (128, 128, 3)
    assert labels.shape == (10, 5)
    # one valid label [cls, cx, cy, w, h] scaled by r
    valid = labels[np.abs(labels).sum(1) > 0]
    assert len(valid) == 1
    r = min(128 / 120, 128 / 160)
    np.testing.assert_allclose(valid[0, 1:], np.array([50, 60, 60, 60]) * r,
                               rtol=1e-5)
    assert valid[0, 0] == 3 % 5


def test_omni_transform_joint_flip_consistency():
    tf = TrainTransformOmni(max_labels=5, hsv_prob=0.0)
    rng = np.random.RandomState(0)
    img = (rng.rand(100, 100, 3) * 255).astype(np.uint8)
    res = np.array([[10, 10, 50, 50, 0]], np.float32)
    _, lab_noflip = tf(img.copy(), res.copy(), (128, 128), joint=True, flip=False)
    _, lab_flip = tf(img.copy(), res.copy(), (128, 128), joint=True, flip=True)
    # SOT labels get tid=1 on their single instance
    assert lab_noflip[0, 5] == 1.0
    r = 1.28
    assert abs(lab_noflip[0, 1] - 30 * r) < 1e-3
    assert abs(lab_flip[0, 1] - (100 - 30) * r) < 1e-3


def test_mosaic_detection():
    ds = FakeDetDataset(n=8)
    tf = TrainTransform(max_labels=50, flip_prob=0.0, hsv_prob=0.0)
    mosaic = MosaicDetection(ds, (128, 128), tf, mosaic_prob=1.0,
                             mixup_prob=1.0)
    img, labels, _, _ = mosaic[0]
    assert img.shape == (128, 128, 3)
    assert labels.shape == (50, 5)
    # mosaic off -> plain path
    mosaic.close_mosaic()
    img2, labels2, _, _ = mosaic[0]
    assert img2.shape == (128, 128, 3)
    n_valid = (np.abs(labels2).sum(1) > 0).sum()
    assert n_valid == 1


def test_letterbox_device_matches_host():
    import jax.numpy as jnp

    from unicorn_tpu.ops.letterbox import letterbox_device

    rng = np.random.RandomState(0)
    img = (rng.rand(100, 200, 3) * 255).astype(np.uint8)
    host, r_host = letterbox(img, (128, 128))
    dev, r_dev = letterbox_device(jnp.asarray(img), (100, 200), (128, 128))
    assert abs(r_host - r_dev) < 1e-9
    # padding identical, content within rounding of cv2's uint8 quantization
    np.testing.assert_allclose(np.asarray(dev)[70:], host[70:])
    diff = np.abs(np.asarray(dev)[:64] - host[:64])
    assert diff.mean() < 1.0 and diff.max() <= 2.0


def test_voc_dataset_loader(tmp_path):
    """Native VOC XML parser + loud-fail split (reference voc.py:24-366)."""
    import cv2
    from unicorn_tpu.data.datasets.voc import VOCDetection, parse_voc_xml

    root = tmp_path / "VOC2007"
    (root / "Annotations").mkdir(parents=True)
    (root / "JPEGImages").mkdir()
    (root / "ImageSets" / "Main").mkdir(parents=True)
    xml = """<annotation><size><width>100</width><height>80</height>
    <depth>3</depth></size>
    <object><name>dog</name><difficult>0</difficult>
      <bndbox><xmin>10</xmin><ymin>20</ymin><xmax>50</xmax><ymax>60</ymax></bndbox>
    </object>
    <object><name>person</name><difficult>1</difficult>
      <bndbox><xmin>60</xmin><ymin>5</ymin><xmax>90</xmax><ymax>40</ymax></bndbox>
    </object></annotation>"""
    (root / "Annotations" / "000001.xml").write_text(xml)
    cv2.imwrite(str(root / "JPEGImages" / "000001.jpg"),
                np.zeros((80, 100, 3), np.uint8))
    (root / "ImageSets" / "Main" / "trainval.txt").write_text("000001\n")

    res, (h, w) = parse_voc_xml(str(root / "Annotations" / "000001.xml"))
    assert (h, w) == (80, 100) and res.shape == (2, 5)
    # 1-based xmin/ymin shifted to 0-based; xmax/ymax unchanged
    np.testing.assert_allclose(res[0, :4], [9, 19, 50, 60])
    assert res[0, 4] == 11  # dog
    assert res[1, 4] == 14  # person (difficult kept by default)

    ds = VOCDetection(str(tmp_path), image_sets=(("2007", "trainval"),))
    assert len(ds) == 1
    img, tgt, info, _ = ds.pull_item(0)
    assert img.shape == (80, 100, 3) and tgt.shape == (2, 5)

    res2, _ = parse_voc_xml(str(root / "Annotations" / "000001.xml"),
                            keep_difficult=False)
    assert res2.shape == (1, 5)

    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        VOCDetection(str(tmp_path), image_sets=(("2012", "trainval"),))


def test_train_transform_4tasks_dispatch():
    from unicorn_tpu.data.transforms import TrainTransform4Tasks

    tr = TrainTransform4Tasks(max_labels=10, flip_prob=0.0, hsv_prob=0.0)
    rng = np.random.RandomState(0)
    img = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    targets = np.array([[10, 10, 40, 40, 0, 3]], np.float32)
    # box task: no masks
    img_t, labels, m = tr(img.copy(), targets.copy(), None, (64, 64))
    assert m is None and labels.shape == (10, 6)
    assert labels[0, 0] == 0 and labels[0, 5] == 3
    # mask task
    masks = np.zeros((60, 80, 1), np.uint8)
    masks[10:40, 10:40, 0] = 1
    img_t, labels, m = tr(img.copy(), targets.copy(), masks, (64, 64))
    assert m is not None and labels.shape == (10, 6)


def test_convert_mot17_to_omni(tmp_path):
    import json
    import sys
    sys.path.insert(0, "tools")
    from convert_datasets import convert_mot17_to_omni

    ann_dir = tmp_path / "annotations"
    ann_dir.mkdir()
    coco = {
        "images": [
            {"id": 1, "video_id": 7, "frame_id": 1, "height": 80,
             "width": 100, "file_name": "v7/000001.jpg"},
            {"id": 2, "video_id": 7, "frame_id": 2, "height": 80,
             "width": 100, "file_name": "v7/000002.jpg"},
        ],
        "annotations": [
            {"image_id": 1, "bbox": [10, 10, 20, 20], "category_id": 1,
             "track_id": 5, "iscrowd": 0},
            {"image_id": 2, "bbox": [12, 11, 20, 20], "category_id": 1,
             "track_id": 5, "iscrowd": 0},
        ],
        "categories": [{"id": 1, "name": "pedestrian"}],
    }
    json.dump(coco, open(ann_dir / "train.json", "w"))
    convert_mot17_to_omni(str(tmp_path))
    omni = json.load(open(ann_dir / "train_omni.json"))
    assert set(omni) == {"7"}
    assert set(omni["7"]) == {"1", "2"}
    rec = omni["7"]["1"]
    assert rec["res"] == [[10, 10, 30, 30, 0, 5]]
    assert rec["img_info"][:2] == [80, 100]


def test_loader_rank_disjoint_sampling():
    """Multi-host DP: set_rank must decorrelate per-host sample streams
    (reference DistributedSampler role). DetLoader strides its epoch order
    rank::world into disjoint halves; sampling loaders reseed their RNG."""
    from unicorn_tpu.data.loader import DetLoader, UniLoader

    ds = list(range(100))
    l0 = DetLoader(ds, 4, shuffle=False).set_rank(0, 2)
    l1 = DetLoader(ds, 4, shuffle=False).set_rank(1, 2)
    assert set(l0._order).isdisjoint(l1._order)
    assert len(l0._order) + len(l1._order) == len(ds)

    u0 = UniLoader(None, None, 4, (64, 64)).set_rank(0, 2)
    s0 = [u0._rng.random() for _ in range(8)]
    u1 = UniLoader(None, None, 4, (64, 64)).set_rank(1, 2)
    s1 = [u1._rng.random() for _ in range(8)]
    assert s0 != s1


def test_uni_mask_loader_4task_mixed_batch():
    """4-task joint loading (reference MosaicDetectionUni4tasks role): one
    batch mixes mask samples (VOS/MOTS 3-tuples) and box samples (SOT/MOT
    2-tuples); box samples get zero masks so shapes stay static."""
    import numpy as np

    from unicorn_tpu.data.loader import UniMaskLoader
    from unicorn_tpu.data.transforms import TrainTransform4Tasks

    H = W = 64

    class MixedDS:
        def __init__(self):
            self.call = 0

        def pull_item(self, _):
            img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
            res = np.array([[5, 5, 30, 30, 0, 1]], np.float32)
            self.call += 1
            if self.call % 2:
                masks = np.zeros((48, 64, 1), np.float32)
                masks[8:28, 8:28, 0] = 1.0
                return [(img, res, masks), (img, res, masks)], 3  # VOS
            return [(img, res), (img, res)], 1                    # SOT

        def alter_task(self):
            pass

    loader = UniMaskLoader(MixedDS(), TrainTransform4Tasks(max_labels=10),
                           batch_size=2, input_size=(H, W))
    imgs, tgts, tids, masks = loader._make_batch()
    assert imgs.shape == (2, 2, H, W, 3)
    assert tgts.shape == (2, 2, 10, 6)
    assert masks.shape == (2, 2, 10, H // 4, W // 4)
    assert set(tids.tolist()) == {1, 3}
    # the VOS sample carries a real mask, the SOT sample an all-zero one
    per_sample = masks.reshape(2, -1).sum(1)
    assert (per_sample > 0).sum() == 1


def test_uni_loader_workers_parallel():
    """workers>1: batches keep shape/type contracts and the task-alternation
    protocol stays batch-consistent (sampling is serialized under the lock)."""
    import numpy as np

    from unicorn_tpu.data.loader import UniLoader
    from unicorn_tpu.data.transforms import TrainTransformOmni

    H = W = 64

    class DS:
        def __init__(self):
            self.task = 1

        def pull_item(self, _):
            img = (np.random.rand(48, 64, 3) * 255).astype(np.uint8)
            res = np.array([[5, 5, 30, 30, 0, 1]], np.float32)
            return [(img, res), (img, res)], self.task

        def alter_task(self):
            self.task = 3 - self.task

    loader = UniLoader(DS(), TrainTransformOmni(max_labels=8), batch_size=3,
                       input_size=(H, W), alter_every=1, workers=3)
    it = iter(loader)
    seen_tasks = set()
    for _ in range(6):
        imgs, tgts, tids = next(it)
        assert imgs.shape == (3, 2, H, W, 3)
        assert tgts.shape == (3, 2, 8, 6)
        # one task per batch (the alternation protocol)
        assert len(set(tids.tolist())) == 1
        seen_tasks.add(int(tids[0]))
    loader.stop()
    assert seen_tasks == {1, 2}  # alternation still flips across batches


def _mini_mot_json(path, n_imgs=2):
    """Minimal COCO-video json the MOTOmniDataset can open."""
    import json
    import os

    os.makedirs(os.path.dirname(path), exist_ok=True)
    d = {
        "images": [{"id": i, "file_name": f"{i}.jpg", "video_id": -1,
                    "frame_id": 0, "height": 64, "width": 64}
                   for i in range(n_imgs)],
        "annotations": [{"id": i, "image_id": i, "category_id": 1,
                         "bbox": [4, 4, 20, 20], "area": 400, "iscrowd": 0,
                         "track_id": -1} for i in range(n_imgs)],
        "categories": [{"id": 1, "name": "person"}],
    }
    json.dump(d, open(path, "w"))


def test_track_exp_default_mix_weights(tmp_path, monkeypatch, caplog):
    """ExpTrack assembles the reference's default mix
    (unicorn_track.py:283-332): motchallenge MOT group weighted [2,6,1,1],
    SOT group COCOSOT+LaSOT+GOT10K+TrackingNet [1,1,1,1]; datasets whose
    files are absent are skipped with a logged warning and the weight
    vector renormalized over the survivors."""
    import logging

    from unicorn_tpu.exp.track import ExpTrack

    monkeypatch.setenv("UNICORN_DATADIR", str(tmp_path))
    # only MOT17 + CrowdHuman present
    _mini_mot_json(str(tmp_path / "mot" / "annotations" / "train_omni.json"))
    _mini_mot_json(
        str(tmp_path / "crowdhuman" / "annotations" / "train.json"))

    exp = ExpTrack()
    exp.mot_test_name = "motchallenge"

    # spec surface matches the reference groups exactly
    assert [(n, w) for n, w, _ in exp._sot_dataset_specs(str(tmp_path))] == \
        [("COCOSOT", 1), ("LaSOT", 1), ("GOT10K", 1), ("TrackingNet", 1)]
    assert [(n, w) for n, w, _ in exp._mot_dataset_specs(str(tmp_path))] == \
        [("MOT17", 2), ("CrowdHuman", 6), ("CityPersons", 1), ("ETHZ", 1)]

    # setup_logger (run by any earlier Trainer test) sets propagate=False on
    # this logger; caplog captures via root propagation, so restore it here
    log = logging.getLogger("unicorn_tpu")
    old_propagate = log.propagate
    log.propagate = True
    try:
        with caplog.at_level(logging.WARNING, logger="unicorn_tpu"):
            ds = exp.get_dataset()
    finally:
        log.propagate = old_propagate
    # MOT group: the two present datasets with their reference weights,
    # renormalized (2:6 -> 0.25:0.75)
    mot = ds.mot_dataset
    assert len(mot.datasets) == 2
    np.testing.assert_allclose(mot.p_datasets, [2 / 8, 6 / 8])
    # SOT group: nothing present -> None, and each skip was announced
    assert ds.sot_dataset is None
    skipped = [r.message for r in caplog.records]
    for name in ("COCOSOT", "LaSOT", "GOT10K", "TrackingNet",
                 "CityPersons", "ETHZ"):
        assert any(name in m for m in skipped), f"no skip warning for {name}"


def test_track_exp_bdd_mix(tmp_path, monkeypatch):
    """bdd100k mot_test_name keeps the single-dataset BDD group
    (unicorn_track.py:304-315)."""
    from unicorn_tpu.exp.track import ExpTrack

    monkeypatch.setenv("UNICORN_DATADIR", str(tmp_path))
    exp = ExpTrack()
    assert [(n, w) for n, w, _ in exp._mot_dataset_specs(str(tmp_path))] == \
        [("BDD100K", 1)]
    import pytest as _pytest

    exp.mot_test_name = "nonsense"
    with _pytest.raises(ValueError):
        exp._mot_dataset_specs(str(tmp_path))


def test_default_mix_through_uni_loader(tmp_path, monkeypatch):
    """The new default SOT mix's COCOSOT path feeds the real UniLoader:
    build a mini on-disk COCO train set, let ExpTrack assemble the mix
    (COCOSOT the only present dataset), and draw real 2-frame batches."""
    import json

    from unicorn_tpu.exp.track import ExpTrack

    monkeypatch.setenv("UNICORN_DATADIR", str(tmp_path))
    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "train2017").mkdir()
    import cv2

    rng = np.random.RandomState(0)
    images, annos = [], []
    for i in range(3):
        name = f"{i:012d}.jpg"
        cv2.imwrite(str(root / "train2017" / name),
                    (rng.rand(60, 80, 3) * 255).astype(np.uint8))
        images.append({"id": i + 1, "file_name": name,
                       "width": 80, "height": 60})
        annos.append({"id": i + 1, "image_id": i + 1, "category_id": 1,
                      "bbox": [10, 10, 30, 24], "area": 720, "iscrowd": 0})
    json.dump({"images": images, "annotations": annos,
               "categories": [{"id": 1, "name": "person"}]},
              open(root / "annotations" / "instances_train2017.json", "w"))

    exp = ExpTrack()
    exp.input_size = (64, 64)
    exp.max_labels = 5
    exp.samples_per_epoch = 4
    exp.sot_only = True  # only the SOT group (COCOSOT) is on disk
    loader = exp.get_data_loader(batch_size=2)
    it = iter(loader)
    imgs, targets, task_ids = next(it)
    assert imgs.shape == (2, 2, 64, 64, 3)
    assert targets.shape == (2, 2, 5, 6)
    assert set(np.asarray(task_ids)) == {1}  # SOT task
    # the duplicated-frame COCOSOT sample carries exactly one valid box
    valid = (targets[..., 2:4] > 0).all(-1)
    assert valid.sum(axis=-1).max() >= 1
    if hasattr(loader, "close"):
        loader.close()


def test_det_loader_no_batch_discard_on_full_queue():
    """Round-5 regression: the prefetch workers must retry the SAME batch on
    queue.Full, not rebuild — rebuilding silently skipped epoch samples
    (DetLoader's strided order advanced) and burned host CPU."""
    import time

    from unicorn_tpu.data.loader import DetLoader

    class DS:
        def __len__(self):
            return 8

        def __getitem__(self, idx):
            return (np.full((4, 4, 3), idx, np.uint8),
                    np.array([[idx]], np.float32), None, None)

    loader = DetLoader(DS(), batch_size=2, prefetch=1, shuffle=False)
    it = iter(loader)
    # let the worker fill the queue, build the next batch, and hit at least
    # one 1.0s put-timeout (where the old code discarded the built batch)
    time.sleep(2.5)
    seen = []
    for _ in range(8):  # two full epochs
        _, labels = next(it)
        seen.extend(int(l[0, 0]) for l in labels)
    loader.stop()
    assert seen == list(range(8)) * 2, seen


def test_omni_sample_load_split_preserves_protocol():
    """OmniDataset/Plus expose sample_spec (RNG only, runs under the loader
    lock) + load_spec (I/O, runs outside): the split must produce the same
    (frames, task) protocol as pull_item and keep task alternation intact."""
    from unicorn_tpu.data.datasets.omni import OmniDataset, OmniDatasetPlus

    class Sub:
        def __init__(self, tag):
            self.tag = tag
            self.loads = 0

        def __len__(self):
            return 4

        def pull_item_omni(self, seq_id, num_frames=2):
            self.loads += 1
            return [(self.tag, seq_id)] * num_frames

    sot, mot = Sub("sot"), Sub("mot")
    plus = OmniDatasetPlus(OmniDataset([sot]), OmniDataset([mot]),
                           mode="alter")
    spec = plus.sample_spec(0)
    assert sot.loads == 0 and mot.loads == 0  # sampling does no I/O
    frames, task = plus.load_spec(spec)
    assert task == 1 and frames[0][0] == "sot" and sot.loads == 1
    plus.alter_task()
    frames, task = plus.load_spec(plus.sample_spec(0))
    assert task == 2 and frames[0][0] == "mot" and mot.loads == 1


def test_cocosot_frames_do_not_share_memory():
    """Round-5 regression: COCOSOT returned the SAME ndarray for both frames,
    so the in-place HSV augment compounded frame 1's jitter into frame 2."""
    from unicorn_tpu.data.datasets.sot import COCOSOT

    class FakeCOCO:
        annotations = [(np.array([[4, 4, 20, 20, 1]], np.float32), None, None)]

        def __len__(self):
            return 1

        def pull_item(self, idx):
            return (np.zeros((32, 32, 3), np.uint8),
                    self.annotations[idx][0].copy(), None, None)

    ds = COCOSOT(FakeCOCO())
    (img0, box0), (img1, box1) = ds.pull_item_omni(0)
    assert not np.shares_memory(img0, img1)
    assert not np.shares_memory(box0, box1)
    img0[:] = 255  # in-place augment on frame 1 ...
    assert img1.max() == 0  # ... must not leak into frame 2


def test_sample_pair_ids_frame_id_units():
    """Round-5 regression: SOT pair sampling measured max_gap in visible-list
    index units, so an occlusion stretch silently widened the temporal window.
    Frame-id units must never pair frames across a large invisible gap."""
    import random as _random

    from unicorn_tpu.data.datasets.sot import SequenceSOTBase

    base = SequenceSOTBase()
    base.max_gap = 10
    # two visible clusters separated by a 1000-frame occlusion
    frame_ids = np.array([0, 1, 2, 3, 4, 1000, 1001, 1002])
    _random.seed(0)
    for _ in range(300):
        a, b = base._sample_pair_ids(frame_ids, 2)
        assert abs(int(frame_ids[a]) - int(frame_ids[b])) <= 10


def test_train_transform_ins_all_filtered_fallback():
    """Round-5 regression: TrainTransformIns lacked the all-boxes-filtered
    fallback its box siblings have — a frame whose objects all shrink below
    1px trained as an all-zero-label sample. Reference restores the
    un-augmented boxes and zeroes the masks (data_augment.py:761-768)."""
    from unicorn_tpu.data.transforms import TrainTransformIns

    t = TrainTransformIns(max_labels=4, flip_prob=0.0, hsv_prob=0.0)
    img = np.full((128, 128, 3), 90, np.uint8)
    targets = np.array([[10, 10, 12, 12, 2, 5]], np.float32)  # 2px box
    masks = np.zeros((128, 128, 1), np.float32)
    masks[10:12, 10:12, 0] = 1.0
    # letterbox to 64x64 halves the box to 1px -> filtered by the >1px gate
    img_t, labels, masks_t = t(img, targets, masks, (64, 64),
                               joint=True, flip=False)
    assert labels[0, 0] == 2 and labels[0, 5] == 5  # cls/tid restored
    np.testing.assert_allclose(labels[0, 1:5], [5.5, 5.5, 1.0, 1.0])
    assert labels[1:].sum() == 0
    assert masks_t.sum() == 0  # masks zeroed, as in the reference


def test_lasot_on_disk_sampling_and_cache(tmp_path):
    """Lasot layout end-to-end: visibility filtering skips occluded frames,
    the pair respects max_gap in frame-id units, and the per-sequence
    annotation parse is cached (round-5: was re-loadtxt'd per sample)."""
    import cv2

    from unicorn_tpu.data.datasets.sot import Lasot

    seq = tmp_path / "cat" / "cat-1"
    (seq / "img").mkdir(parents=True)
    n = 12
    gt, occ = [], []
    for i in range(n):
        cv2.imwrite(str(seq / "img" / f"{i + 1:08d}.jpg"),
                    np.full((40, 50, 3), 10 * i, np.uint8))
        gt.append([5 + i, 6, 20, 18])
        occ.append(1 if 4 <= i <= 7 else 0)  # frames 4..7 fully occluded
    np.savetxt(seq / "groundtruth.txt", np.array(gt), fmt="%d", delimiter=",")
    np.savetxt(seq / "full_occlusion.txt", np.array([occ]),
               fmt="%d", delimiter=",")

    ds = Lasot(str(tmp_path), max_gap=2)
    assert len(ds) == 1
    import random as _random

    _random.seed(3)
    for _ in range(40):
        (img0, res0), (img1, res1) = ds.pull_item_omni(0)
        # boxes encode the frame id (x1 = 5 + i): recover and check gap + vis
        i0, i1 = int(res0[0, 0] - 5), int(res1[0, 0] - 5)
        assert abs(i0 - i1) <= 2
        assert not (4 <= i0 <= 7) and not (4 <= i1 <= 7)
        assert img0[0, 0, 0] == 10 * i0  # image matches the annotation row
    assert 0 in ds._info_cache  # parse cached after first pull
