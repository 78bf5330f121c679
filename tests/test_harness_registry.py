"""SOT/VOS harness registry: authoritative split specs + loud-fail loaders
(VERDICT r1 item 7). A silently shrunken eval set reports a wrong AUC, so
loaders raise instead of returning []."""
import os

import numpy as np
import pytest

from unicorn_tpu.harness.datasets import (
    lasot_test_names, load_davis, load_got10k, load_lasot, load_trackingnet,
)


def test_lasot_split_spec():
    names = lasot_test_names()
    assert len(names) == 280
    assert len(set(names)) == 280
    for n in names:
        cls, idx = n.rsplit("-", 1)
        assert cls and idx.isdigit(), n
    # spot-check the published list's first/last entries
    assert names[0] == "airplane-1"
    assert "zebra-17" in names


def test_loaders_raise_on_missing_roots(tmp_path):
    missing = str(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        load_lasot(root=missing)
    with pytest.raises(FileNotFoundError):
        load_got10k(root=missing)
    with pytest.raises(FileNotFoundError):
        load_trackingnet(root=missing)
    with pytest.raises(FileNotFoundError):
        load_davis(root=missing)


def _mk_lasot_seq(root, name, n=3):
    cls = name.split("-")[0]
    sdir = os.path.join(root, cls, name)
    os.makedirs(os.path.join(sdir, "img"), exist_ok=True)
    gt = np.tile([10, 10, 20, 20], (n, 1)).astype(float)
    np.savetxt(os.path.join(sdir, "groundtruth.txt"), gt, delimiter=",")


def test_lasot_loader_exact_and_loud(tmp_path):
    root = str(tmp_path)
    _mk_lasot_seq(root, "airplane-1")
    _mk_lasot_seq(root, "bear-2")
    seqs = load_lasot(root=root, names=["airplane-1", "bear-2"])
    assert [s.name for s in seqs] == ["airplane-1", "bear-2"]
    assert len(seqs[0].frames) == 3
    # a listed sequence without ground truth must raise, not shrink the set
    with pytest.raises(FileNotFoundError):
        load_lasot(root=root, names=["airplane-1", "airplane-9"])
    # and the default split demands all 280
    with pytest.raises(FileNotFoundError):
        load_lasot(root=root)


def test_got10k_uses_list_txt_order(tmp_path):
    root = str(tmp_path)
    for name in ("GOT-10k_Test_000002", "GOT-10k_Test_000001"):
        sdir = os.path.join(root, name)
        os.makedirs(sdir, exist_ok=True)
        np.savetxt(os.path.join(sdir, "groundtruth.txt"),
                   np.array([[5.0, 5.0, 10.0, 10.0]]), delimiter=",")
        open(os.path.join(sdir, "00000001.jpg"), "wb").close()
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("GOT-10k_Test_000002\nGOT-10k_Test_000001\n")
    seqs = load_got10k(root=root)
    assert [s.name for s in seqs] == ["GOT-10k_Test_000002",
                                      "GOT-10k_Test_000001"]


def test_registry_covers_all_reference_benchmarks():
    """The reference registry lists 10 benchmarks
    (external/lib/test/evaluation/datasets.py:9-26 + the DAVIS/yt eval
    paths); every one must have a loader entry here."""
    from unicorn_tpu.harness.datasets import DATASET_REGISTRY

    for name in ("lasot", "got10k_test", "got10k_val", "trackingnet", "otb",
                 "nfs", "uav", "tc128", "dv2016", "dv2017", "yt2018"):
        assert name in DATASET_REGISTRY, name


def test_nfs_uav_manifest_counts_and_loud_fail(tmp_path):
    """The shipped manifest must carry the reference's full sequence tables
    (100 NFS / 123 UAV123, nfsdataset.py / uavdataset.py) and the loaders
    must loud-fail rather than shrink the benchmark."""
    import json

    from unicorn_tpu.harness import datasets as D

    manifest = json.load(open(os.path.join(
        os.path.dirname(D.__file__), "sot_benchmarks.json")))
    assert len(manifest["nfs"]["sequences"]) == 100
    assert len(manifest["uav"]["sequences"]) == 123
    assert manifest["nfs"]["sequences"][0]["name"] == "nfs_Gymnastics"
    assert all(s["name"].startswith("uav_")
               for s in manifest["uav"]["sequences"][:5])
    with pytest.raises(FileNotFoundError):
        D.load_nfs(root=str(tmp_path / "nope"))
    with pytest.raises(FileNotFoundError):
        D.load_uav(root=str(tmp_path / "nope"))
    # root exists but annotations absent -> still loud
    os.makedirs(tmp_path / "nfs_root", exist_ok=True)
    with pytest.raises(FileNotFoundError):
        D.load_nfs(root=str(tmp_path / "nfs_root"))


def test_tc128_loader_scan_and_range(tmp_path):
    from unicorn_tpu.harness.datasets import load_tc128

    root = tmp_path / "TC128"
    for name, lo, hi in (("Airport_ce", 1, 3), ("Ball_ce1", 2, 4)):
        sdir = root / name
        (sdir / "img").mkdir(parents=True)
        np.savetxt(sdir / f"{name}_gt.txt",
                   np.tile([5.0, 5.0, 10.0, 10.0], (hi - lo + 1, 1)),
                   delimiter=",")
        (sdir / f"{name}_frames.txt").write_text(f"{lo},{hi}")
    seqs = load_tc128(root=str(root))
    assert [s.name for s in seqs] == ["Airport_ce", "Ball_ce1"]
    assert seqs[0].frames[0].endswith("img/0001.jpg")
    assert len(seqs[1].frames) == 3
    with pytest.raises(FileNotFoundError):
        load_tc128(root=str(tmp_path / "nope"))


def test_ytvos_loader_meta_and_mid_video_objects(tmp_path):
    import json

    from unicorn_tpu.harness.datasets import load_ytvos

    root = tmp_path / "ytbvos18"
    vdir = root / "valid"
    meta = {"videos": {
        "003234408d": {"objects": {
            "1": {"frames": ["00000", "00005"]},
            "2": {"frames": ["00005"]},   # enters mid-video
        }},
    }}
    (vdir / "JPEGImages" / "003234408d").mkdir(parents=True)
    (vdir / "Annotations" / "003234408d").mkdir(parents=True)
    for f in ("00000", "00005"):
        (vdir / "JPEGImages" / "003234408d" / f"{f}.jpg").touch()
    (vdir / "Annotations" / "003234408d" / "00000.png").touch()
    (vdir / "Annotations" / "003234408d" / "00005.png").touch()
    (vdir / "meta.json").write_text(json.dumps(meta))
    seqs = load_ytvos(root=str(root))
    assert len(seqs) == 1
    assert seqs[0].object_ids == [1, 2]  # ints, numerically sorted
    assert len(seqs[0].frames) == 2 and len(seqs[0].masks) == 2
    with pytest.raises(FileNotFoundError):
        load_ytvos(root=str(tmp_path / "nope"))


def _mk_otb_seq(root, dirname, gt_files, n_rows, first_frame=None):
    sdir = os.path.join(root, dirname)
    os.makedirs(os.path.join(sdir, "img"), exist_ok=True)
    gt = np.tile([10, 10, 20, 20], (n_rows, 1)).astype(float)
    for f in gt_files:
        np.savetxt(os.path.join(sdir, f), gt, delimiter=",")
    if first_frame:
        open(os.path.join(sdir, "img", first_frame), "wb").close()


def test_otb_loader_protocol_metadata(tmp_path):
    """OTB per-sequence protocol facts (regression: frames misaligned with
    gt for range sequences like David/BlurCar*, Jogging/Skating2/Human4
    silently dropped, Tiger1's 5 init frames scored)."""
    from unicorn_tpu.harness.datasets import load_otb

    root = str(tmp_path)
    # range sequence: annotated frames 3..359 (BlurCar3)
    _mk_otb_seq(root, "BlurCar3", ["groundtruth_rect.txt"], 357,
                first_frame="0003.jpg")
    # dual-target sequence shipping numbered annotation files
    _mk_otb_seq(root, "Jogging",
                ["groundtruth_rect.1.txt", "groundtruth_rect.2.txt"], 10,
                first_frame="0001.jpg")
    # init-omit sequence: first 5 frames excluded from protocol
    _mk_otb_seq(root, "Tiger1", ["groundtruth_rect.txt"], 20,
                first_frame="0001.jpg")
    # plain sequence
    _mk_otb_seq(root, "Basketball", ["groundtruth_rect.txt"], 8,
                first_frame="0001.jpg")
    seqs = {s.name: s for s in load_otb(root=root)}
    assert set(seqs) == {"BlurCar3", "Jogging_1", "Jogging_2", "Tiger1",
                         "Basketball"}
    assert seqs["BlurCar3"].frames[0].endswith("0003.jpg")
    assert len(seqs["BlurCar3"].frames) == 357
    assert len(seqs["Jogging_1"].frames) == 10
    assert seqs["Tiger1"].frames[0].endswith("0006.jpg")
    assert len(seqs["Tiger1"].frames) == 15
    assert len(seqs["Tiger1"].ground_truth_rect) == 15
    assert len(seqs["Basketball"].frames) == 8
    # a sequence directory with img/ but no annotation must raise loudly
    os.makedirs(os.path.join(root, "Broken", "img"), exist_ok=True)
    with pytest.raises(FileNotFoundError):
        load_otb(root=root)


def test_read_indexed_mask_preserves_palette_indices(tmp_path):
    """DAVIS/YT-VOS annotations are palette PNGs: cv2 grayscale decodes the
    palette to luma (ids 1,2,3 -> 38,75,113); the harness reader must
    return the raw indices (regression for corrupted object identities)."""
    import cv2
    from PIL import Image

    from unicorn_tpu.utils.label_ops import read_indexed_mask

    m = np.zeros((8, 10), np.uint8)
    m[1:4, 1:4] = 1
    m[5:7, 2:6] = 2
    m[1:3, 7:9] = 3
    img = Image.fromarray(m, mode="P")
    # the standard DAVIS palette: id 1 -> (128,0,0), 2 -> (0,128,0), ...
    pal = [0, 0, 0, 128, 0, 0, 0, 128, 0, 128, 128, 0] + [0] * (768 - 12)
    img.putpalette(pal)
    p = str(tmp_path / "00000.png")
    img.save(p)
    got = read_indexed_mask(p)
    assert set(np.unique(got)) == {0, 1, 2, 3}
    np.testing.assert_array_equal(got, m)
    luma = cv2.imread(p, cv2.IMREAD_GRAYSCALE)
    assert set(np.unique(luma)) != {0, 1, 2, 3}  # the bug this guards


def test_seg2bmap_border_semantics():
    """Reference seg2bmap ASSIGNS the last row/col (a mask flush against
    the frame edge has no boundary there); |= would mark every border-
    touching foreground pixel as boundary and skew F for cropped objects."""
    from unicorn_tpu.harness.davis_metrics import _seg2bmap

    # full-frame mask: no boundary at all inside the frame
    assert _seg2bmap(np.ones((5, 5), bool)).sum() == 0
    # half-plane touching the bottom edge: only the top transition row
    half = np.zeros((5, 5), bool)
    half[2:, :] = True
    b = _seg2bmap(half)
    assert b.sum() == 5, b.astype(int)
    assert b[1, :].all() and not b[4, :].any()
