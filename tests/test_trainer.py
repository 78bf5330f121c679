"""End-to-end Trainer loop: tiny uni model, synthetic omni data, checkpoint
save + resume."""
import os

import numpy as np
import pytest

from unicorn_tpu.core.trainer import Trainer
from unicorn_tpu.exp.track import ExpTrack

H = W = 64


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
            res = np.array([[10, 10, 30, 30, 0, 1],
                            [25, 20, 50, 45, 1, 2]], np.float32)
            out.append((img, res))
        return out


class TinyExp(ExpTrack):
    def __init__(self, out_dir):
        super().__init__()
        self.exp_name = "tiny_test"
        self.output_dir = out_dir
        self.backbone_name = "csp_darknet"
        self.depth = 0.33
        self.width = 0.25
        self.in_channels = [256, 512, 1024]
        self.interact_mode = "conv"
        self.n_layer_att = 0
        self.use_attention = False
        self.bf16 = False
        self.input_size = (H, W)
        self.max_labels = 5
        self.samples_per_epoch = 6
        self.max_epoch = 1
        self.multiscale_range = 0
        self.ema = True
        self.use_grad_acc = False
        self.eval_interval = 100  # no in-training eval
        self.print_interval = 2
        self.pretrain_name = None

    def get_dataset(self, **kw):
        from unicorn_tpu.data.datasets.omni import OmniDataset, OmniDatasetPlus

        sot = OmniDataset([FakeSOT()], samples_per_epoch=3)
        mot = OmniDataset([FakeMOT()], samples_per_epoch=3)
        return OmniDatasetPlus(sot, mot, 6, mode="alter")


def test_trainer_end_to_end(tmp_path):
    exp = TinyExp(str(tmp_path))
    trainer = Trainer(exp, {"batch_size": 2})
    trainer.train()
    ckpt_dir = os.path.join(str(tmp_path), "tiny_test", "latest")
    assert os.path.exists(ckpt_dir)

    # resume continues from epoch 1 (== max_epoch -> no more training)
    exp2 = TinyExp(str(tmp_path))
    t2 = Trainer(exp2, {"batch_size": 2, "resume": True})
    t2.before_train()
    assert t2.start_epoch == 1


def test_trainer_no_aug_transition(tmp_path):
    """At max_epoch - no_aug_epochs the trainer closes mosaic, enables L1
    (reference trainer.py before_epoch), and drops a checkpoint."""
    exp = TinyExp(str(tmp_path))
    exp.max_epoch = 2
    exp.no_aug_epochs = 1
    trainer = Trainer(exp, {"batch_size": 2})

    closed = []

    class _Loader:
        dataset = None

        def close_mosaic(self):
            closed.append(True)

    trainer.before_train()
    trainer.loader = _Loader()
    trainer.epoch = 0
    trainer.before_epoch()
    assert not trainer.no_aug and not closed  # too early

    trainer.epoch = 1  # == max_epoch - no_aug_epochs
    trainer._step_fns["sentinel"] = object()
    trainer.before_epoch()
    assert trainer.no_aug and closed == [True]
    assert "sentinel" not in trainer._step_fns  # step fns rebuilt with L1
    assert os.path.exists(tmp_path / "tiny_test" /
                          "last_mosaic_epoch.ckpt.msgpack") or \
        any("last_mosaic_epoch" in f
            for f in os.listdir(tmp_path / "tiny_test"))
    # idempotent
    trainer.before_epoch()
    assert closed == [True]


def test_async_checkpoint_roundtrip(tmp_path):
    """Non-blocking save + wait_for_checkpoints == blocking save contents."""
    import numpy as np

    from unicorn_tpu.core.checkpoint import (
        load_checkpoint, save_checkpoint, wait_for_checkpoints,
    )

    state = {"params": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)},
             "epoch": 3}
    save_checkpoint(str(tmp_path), state, "async_ck", blocking=False)
    wait_for_checkpoints()
    loaded = load_checkpoint(str(tmp_path), "async_ck")
    np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])
    assert int(loaded["epoch"]) == 3
