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


def _fixed_uni_batches(n, bs=2, h=H, w=W, m=5):
    """Deterministic synthetic uni batches (images, targets, task_ids)."""
    rng = np.random.RandomState(7)
    batches = []
    for _ in range(n):
        images = (rng.rand(bs, 2, h, w, 3) * 255).astype(np.float32)
        t = np.zeros((bs, m, 6), np.float32)
        t[:, 0] = [0, h // 2, w // 2, 20, 20, 1]
        targets = np.stack([t, t], 1)
        task_ids = np.asarray(([1, 2] * bs)[:bs], np.int32)
        batches.append((images, targets, task_ids))
    return batches


def _run_steps(trainer, batches):
    from unicorn_tpu.parallel.mesh import shard_batch

    for b in batches:
        sb = shard_batch(trainer.mesh, b)
        trainer.state, _ = trainer.step_fn(trainer.state, *sb)


def test_resume_restores_optimizer_state_bit_identical(tmp_path):
    """Checkpoint mid-run (mid-grad-accumulation, so the MultiSteps mini_step
    counter is nonzero) + resume must reproduce the uninterrupted run
    bit-identically: params, EMA, AdamW moments, and the accumulation counter
    all continue (reference trainer.py:476-485 resumes model+optimizer+best_ap).
    """
    import jax

    from unicorn_tpu.core.checkpoint import wait_for_checkpoints

    def make_trainer(subdir, resume=False):
        exp = TinyExp(str(tmp_path / subdir))
        exp.use_grad_acc = True
        exp.grad_acc_step = 2
        args = {"batch_size": 2}
        if resume:
            args["resume"] = True
        tr = Trainer(exp, args)
        tr.before_train()
        return tr

    batches = _fixed_uni_batches(6)

    # A: uninterrupted 6 steps
    tr_a = make_trainer("a")
    _run_steps(tr_a, batches)

    # B: 3 steps (checkpoint lands mid-accumulation: mini_step == 1),
    # save, then resume in a fresh trainer and run the remaining 3
    tr_b = make_trainer("b")
    _run_steps(tr_b, batches[:3])
    tr_b.epoch = 2
    tr_b.best_ap = 0.375
    tr_b.save_ckpt("latest")
    wait_for_checkpoints()

    tr_c = make_trainer("b", resume=True)
    assert tr_c.start_epoch == 3
    assert tr_c.best_ap == 0.375
    # the accumulation counter resumed nonzero — the regression VERDICT r3
    # flagged (a fresh MultiSteps restarts at 0)
    mini_step = jax.tree_util.tree_leaves(tr_c.state.opt_state)[0]
    assert int(np.asarray(mini_step)) == 1
    _run_steps(tr_c, batches[3:])

    flat_a = jax.tree_util.tree_flatten(jax.device_get(
        (tr_a.state.params, tr_a.state.ema_params, tr_a.state.opt_state)))[0]
    flat_c = jax.tree_util.tree_flatten(jax.device_get(
        (tr_c.state.params, tr_c.state.ema_params, tr_c.state.opt_state)))[0]
    assert len(flat_a) == len(flat_c)
    for xa, xc in zip(flat_a, flat_c):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xc))
    assert int(tr_a.state.step) == int(tr_c.state.step) == 6


def test_resume_without_opt_state_falls_back(tmp_path):
    """Old checkpoints (params/EMA/epoch only) still resume — with fresh
    optimizer moments and a warning rather than a crash."""
    import jax

    from unicorn_tpu.core.checkpoint import save_checkpoint

    exp = TinyExp(str(tmp_path))
    tr = Trainer(exp, {"batch_size": 2})
    tr.before_train()
    old = {
        "params": jax.device_get(tr.state.params),
        "ema_params": jax.device_get(tr.state.ema_params),
        "epoch": 1, "step": 5,
    }
    save_checkpoint(os.path.join(str(tmp_path), "tiny_test"), old, "latest")

    exp2 = TinyExp(str(tmp_path))
    tr2 = Trainer(exp2, {"batch_size": 2, "resume": True})
    tr2.before_train()
    assert tr2.start_epoch == 1
    # step 5 overran the epoch-1 boundary (TinyExp has 3 iters/epoch): a
    # mid-epoch checkpoint replays its epoch, so the step count rewinds to
    # the boundary to keep the LR schedule aligned with the iteration count
    assert int(tr2.state.step) == 3


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


def test_resume_from_explicit_ckpt_and_start_epoch(tmp_path):
    """--ckpt with --resume resumes from that path; --start_epoch overrides
    the stored epoch (reference trainer.py:469-483: start_epoch - 1)."""
    exp = TinyExp(str(tmp_path / "x"))
    tr = Trainer(exp, {"batch_size": 2})
    tr.before_train()
    tr.epoch = 4
    tr.best_ap = 0.5
    tr.save_ckpt("special")
    from unicorn_tpu.core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    ckpt_path = os.path.join(str(tmp_path / "x"), "tiny_test", "special")

    exp2 = TinyExp(str(tmp_path / "y"))
    tr2 = Trainer(exp2, {"batch_size": 2, "resume": True, "ckpt": ckpt_path})
    tr2.before_train()
    assert tr2.start_epoch == 5
    assert tr2.best_ap == 0.5

    exp3 = TinyExp(str(tmp_path / "z"))
    tr3 = Trainer(exp3, {"batch_size": 2, "resume": True, "ckpt": ckpt_path,
                         "start_epoch": 3})
    tr3.before_train()
    assert tr3.start_epoch == 2  # reference: args.start_epoch - 1


def test_finetune_ckpt_without_resume_loads_params_only(tmp_path):
    """--ckpt WITHOUT --resume = fine-tune: params load (shape-tolerant),
    epoch/optimizer start fresh (reference trainer.py:494-499)."""
    import jax

    exp = TinyExp(str(tmp_path / "src"))
    tr = Trainer(exp, {"batch_size": 2})
    tr.before_train()
    tr.epoch = 7
    tr.save_ckpt("latest")
    from unicorn_tpu.core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()
    ckpt_path = os.path.join(str(tmp_path / "src"), "tiny_test", "latest")

    exp2 = TinyExp(str(tmp_path / "dst"))
    tr2 = Trainer(exp2, {"batch_size": 2, "ckpt": ckpt_path})
    tr2.before_train()
    assert tr2.start_epoch == 0  # fresh schedule
    a = jax.tree_util.tree_leaves(jax.device_get(tr.state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(tr2.state.params))
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb))


def test_resume_missing_explicit_ckpt_raises(tmp_path):
    """--resume with an explicitly named missing checkpoint must raise, not
    silently restart from scratch."""
    exp = TinyExp(str(tmp_path))
    tr = Trainer(exp, {"batch_size": 2, "resume": True,
                       "ckpt": str(tmp_path / "nope" / "latest")})
    with pytest.raises(FileNotFoundError):
        tr.before_train()


def test_resume_keeps_ema_disabled(tmp_path):
    """exp.ema=False must survive resume: the checkpoint's ema_params copy
    must not re-enable per-step EMA maintenance."""
    exp = TinyExp(str(tmp_path))
    exp.ema = False
    tr = Trainer(exp, {"batch_size": 2})
    tr.before_train()
    assert tr.state.ema_params is None
    tr.epoch = 0
    tr.save_ckpt("latest")
    from unicorn_tpu.core.checkpoint import wait_for_checkpoints

    wait_for_checkpoints()

    exp2 = TinyExp(str(tmp_path))
    exp2.ema = False
    tr2 = Trainer(exp2, {"batch_size": 2, "resume": True})
    tr2.before_train()
    assert tr2.state.ema_params is None


def test_preemption_sigterm_checkpoints_and_stops(tmp_path):
    """SIGTERM mid-epoch -> one blocking `latest` checkpoint at the next
    step boundary recording the UNFINISHED epoch, loop stops, handlers
    restored; resume restarts that epoch with the saved step count."""
    import signal

    from unicorn_tpu.core.checkpoint import load_checkpoint

    exp = TinyExp(str(tmp_path))
    exp.max_epoch = 3  # would run 3 epochs x 3 iters without the signal

    class PreemptedTrainer(Trainer):
        def _get_step_fn(self, size):
            fn = super()._get_step_fn(size)

            def wrapped(*a):
                out = fn(*a)
                if self.epoch == 0 and self.iter == 1:
                    os.kill(os.getpid(), signal.SIGTERM)
                return out

            return wrapped

    before = signal.getsignal(signal.SIGTERM)
    trainer = PreemptedTrainer(exp, {"batch_size": 2})
    trainer.train()  # must return (not die) despite the SIGTERM
    assert trainer._preempted == signal.SIGTERM
    assert trainer.epoch == 0 and trainer.iter == 1  # stopped mid-epoch-0
    assert signal.getsignal(signal.SIGTERM) is before  # handler restored

    ckpt = load_checkpoint(trainer.output_dir, "latest")
    assert int(ckpt["epoch"]) == 0  # resume restarts the interrupted epoch
    assert int(ckpt["step"]) == 2  # both completed steps are in the state

    t2 = Trainer(TinyExp(str(tmp_path)), {"batch_size": 2, "resume": True})
    t2.before_train()
    assert t2.start_epoch == 0
    # the interrupted epoch replays from iter 0, so the step and schedule
    # counters rewind to the epoch-0 boundary (round-5: leaving them at the
    # mid-epoch value ran the LR schedule ahead of the iteration count by
    # the replayed iterations, forever after)
    assert int(t2.state.step) == 0
    import jax as _jax

    for path, leaf in _jax.tree_util.tree_leaves_with_path(t2.state.opt_state):
        name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
        if name in ("count", "gradient_step", "mini_step"):
            assert int(leaf) == 0, (name, int(leaf))


def test_grad_accum_lr_schedule_in_iteration_units():
    """Round-5 regression: optax.MultiSteps advances the inner schedule once
    per grad_accum micro-steps while exps size total_iters in iteration
    units (the reference updates lr every iteration) — make_optimizer must
    rescale the count or the schedule stretches by grad_accum x."""
    import jax.numpy as jnp
    import optax

    from unicorn_tpu.core.train_state import make_optimizer

    lr_fn = lambda c: jnp.asarray(c, jnp.float32)  # lr == schedule count
    tx = make_optimizer(lr_fn, kind="adamw", weight_decay=0.0, grad_accum=2)
    params = {"w": jnp.zeros((1,))}
    grads = {"w": jnp.ones((1,))}
    opt_state = tx.init(params)
    vals = []
    for _ in range(6):  # 6 micro-steps = 3 inner updates
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        vals.append(float(params["w"][0]))
    # adamw with constant grads applies ~ -lr each inner update (mhat/sqrt
    # vhat ~= 1): inner update n must use lr_fn(2n) = 0, 2, 4 (iteration
    # units), not lr_fn(n) = 0, 1, 2
    deltas = np.diff([0.0] + vals)
    inner = deltas[1::2]  # updates land on every 2nd micro-step
    np.testing.assert_allclose(-inner, [0.0, 2.0, 4.0], atol=1e-4)


def test_rewind_opt_counts():
    """Mid-epoch preemption resume rewinds every schedule counter to the
    epoch boundary (the epoch replays from iter 0)."""
    import jax
    import jax.numpy as jnp
    import optax

    from unicorn_tpu.core.train_state import make_optimizer, rewind_opt_counts

    tx = make_optimizer(lambda c: 1e-3, kind="adamw", grad_accum=2)
    params = {"w": jnp.zeros((3,))}
    opt_state = tx.init(params)
    for _ in range(5):  # 5 micro-steps: gradient_step=2, mini_step=1
        updates, opt_state = tx.update({"w": jnp.ones((3,))}, opt_state, params)
        params = optax.apply_updates(params, updates)
    rewound = rewind_opt_counts(opt_state, 1)
    found = {"count": [], "gradient_step": [], "mini_step": []}
    def walk(path, leaf):
        name = path[-1].name if hasattr(path[-1], "name") else str(path[-1])
        if name in found:
            found[name].append(int(leaf))
        return leaf
    jax.tree_util.tree_map_with_path(walk, rewound)
    assert found["gradient_step"] == [1]
    assert found["mini_step"] == [0]
    assert all(c == 1 for c in found["count"]) and found["count"]


def test_before_epoch_no_aug_flips_always_l1():
    """Round-5 regression: the no-aug step-fn rebuild was a no-op for the
    uni/inst tasks because their step factories read exp.always_l1, which
    before_epoch never set (reference flips head.use_l1 on every head)."""
    import logging
    from types import SimpleNamespace

    from unicorn_tpu.core.trainer import Trainer

    tr = object.__new__(Trainer)
    tr.exp = SimpleNamespace(no_aug_epochs=2, always_l1=False)
    tr.no_aug = False
    tr.epoch = 8
    tr.max_epoch = 10
    tr.logger = logging.getLogger("test")
    tr.loader = SimpleNamespace()
    tr._step_fns = {(64, 64): object()}
    tr.save_ckpt = lambda name, **kw: None
    tr.before_epoch()
    assert tr.no_aug
    assert tr.exp.always_l1 is True
    assert tr._step_fns == {}


def test_det_mask_exp_loads_det_pretrain(tmp_path, monkeypatch):
    """Round-5 regression: ExpDetMask set pretrain_name but had no
    load_pretrained, so the Trainer's pretrain hook silently skipped and
    train_mask_only froze a RANDOM detector. The hook must copy every
    shape-matching det tensor and leave the CondInst branch at init."""
    import jax
    import jax.numpy as jnp

    from unicorn_tpu.core.checkpoint import (
        save_checkpoint, wait_for_checkpoints,
    )
    from unicorn_tpu.exp.det_mask import ExpDetMask

    exp = ExpDetMask()
    exp.num_classes = 2
    exp.backbone_name = "csp_darknet"
    exp.depth = 0.33
    exp.width = 0.25
    exp.in_channels = [256, 512, 1024]
    exp.use_attention = False
    exp.n_layer_att = 0
    exp.bf16 = False
    exp.pretrain_name = "det_tiny_test"

    model = exp.get_model()
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    # a "det checkpoint": same tree with every leaf shifted by +1
    det_params = jax.tree_util.tree_map(lambda p: p + 1.0, params)
    monkeypatch.chdir(tmp_path)
    save_checkpoint(str(tmp_path / "Unicorn_outputs" / exp.pretrain_name),
                    {"params": jax.device_get(det_params)}, "latest",
                    blocking=True)
    wait_for_checkpoints()

    loaded = exp.load_pretrained(params)
    flat_new = {"/".join(str(x) for x in k): v for k, v
                in jax.tree_util.tree_leaves_with_path(loaded)}
    flat_old = {"/".join(str(x) for x in k): v for k, v
                in jax.tree_util.tree_leaves_with_path(params)}
    n_copied = n_kept = 0
    for k in flat_new:
        if np.allclose(np.asarray(flat_new[k]),
                       np.asarray(flat_old[k]) + 1.0):
            n_copied += 1
        elif np.allclose(np.asarray(flat_new[k]), np.asarray(flat_old[k])):
            n_kept += 1
    assert n_copied > 50, (n_copied, n_kept)  # detector weights came in
