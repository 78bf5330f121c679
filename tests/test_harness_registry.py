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
