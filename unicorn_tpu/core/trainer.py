"""Training loop driver.

Reference: unicorn/core/trainer.py:50-553. Single-controller jax redesign:
no process spawning/DDP — the jitted train step runs over a data mesh and XLA
emits the gradient psum (parallel/mesh.py). Keeps the reference's training
protocol: task alternation every `alter_step` iters, random input-resize every
10 iters (host-side decision, no rank broadcast needed), EMA, grad
accumulation (optax.MultiSteps), checkpoint save/resume, periodic in-training
eval, meters + ETA logging.
"""
from __future__ import annotations

import os
import time

import numpy as np

from ..parallel.mesh import replicate_state, shard_batch
from ..utils.logger import setup_logger
from ..utils.meters import MeterBuffer
from .checkpoint import load_checkpoint, save_checkpoint
from .train_state import TrainState


class Trainer:
    def __init__(self, exp, args=None):
        import jax

        self.exp = exp
        self.args = args or {}
        self.max_epoch = exp.max_epoch
        self.input_size = tuple(exp.input_size)
        self.batch_size = int(self.args.get("batch_size", 8))
        self.iters_per_epoch = int(
            getattr(exp, "samples_per_epoch", 200000) // self.batch_size
        )
        self.output_dir = os.path.join(exp.output_dir, exp.exp_name)
        os.makedirs(self.output_dir, exist_ok=True)
        self.logger = setup_logger(self.output_dir)
        self.meters = MeterBuffer()
        # data mesh over the largest device count dividing the batch
        n_dev = len(jax.devices())
        if jax.process_count() > 1:
            # multi-host: EVERY device must participate (a truncated mesh
            # would leave some processes with no addressable devices in
            # shard_batch), so the global batch must divide evenly
            assert self.batch_size % n_dev == 0, (
                f"multi-host: global batch {self.batch_size} must divide "
                f"{n_dev} devices")
            assert self.batch_size % jax.process_count() == 0, (
                f"global batch {self.batch_size} must divide "
                f"{jax.process_count()} processes")
        else:
            while self.batch_size % n_dev != 0:
                n_dev -= 1
            if n_dev != len(jax.devices()):
                self.logger.warning(
                    "batch %d not divisible by %d devices; using %d",
                    self.batch_size, len(jax.devices()), n_dev)
        import numpy as _np
        from jax.sharding import Mesh

        self.mesh = Mesh(_np.asarray(jax.devices()[:n_dev]), ("data",))
        self.start_epoch = 0
        self.epoch = 0
        self.iter = 0
        self.best_ap = 0.0
        self.no_aug = False  # flips at max_epoch - no_aug_epochs
        self._preempted = None  # signal number once SIGTERM/SIGUSR1 lands

    # ------------------------------------------------------------------
    def train(self):
        self.before_train()
        old_handlers = self._install_preemption_handlers()
        try:
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.train_in_epoch()
                if self._preempted is not None:
                    break  # checkpoint already written by train_in_epoch
                self.after_epoch()
        finally:
            import signal

            for sig, h in old_handlers.items():
                signal.signal(sig, h)
            from .checkpoint import wait_for_checkpoints

            wait_for_checkpoints()
            self.logger.info("Training done."
                             if self._preempted is None else
                             "Training stopped by signal %s; resume with "
                             "--resume." % self._preempted)

    def _install_preemption_handlers(self):
        """Preemption-safe checkpointing. Preemptible/spot TPU pools deliver
        SIGTERM (maintenance events often SIGUSR1) with a short grace window
        before eviction; the handler only flags it, and the train loop saves
        a BLOCKING `latest` checkpoint at the next step boundary (an async
        save could be killed mid-write) and stops. Resume restarts the
        interrupted epoch — epoch-granularity, matching the reference's
        resume_train semantics (unicorn/core/trainer.py:466-489); the point
        is that hours-long epochs no longer lose their optimizer trajectory
        to an eviction. Returns the displaced handlers for restoration."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return {}  # signal.signal only works on the main thread

        def handler(signum, frame):
            self._preempted = signum

        old = {}
        for sig in (signal.SIGTERM, signal.SIGUSR1):
            try:
                old[sig] = signal.signal(sig, handler)
            except (ValueError, OSError):  # unsupported on this platform
                pass
        return old

    def before_train(self):
        import jax

        exp = self.exp
        self.model = exp.get_model()
        rng = np.random.RandomState(exp.seed or 0)
        dummy = np.asarray(
            rng.rand(1, *self.input_size, 3), np.float32
        )
        import jax.numpy as jnp

        from ..models.unicorn import Unicorn

        if isinstance(self.model, Unicorn):
            params = self.model.init(jax.random.PRNGKey(exp.seed or 0),
                                     jnp.asarray(dummy),
                                     method=Unicorn.init_all)
        else:
            params = self.model.init(jax.random.PRNGKey(exp.seed or 0),
                                     jnp.asarray(dummy))
        if getattr(exp, "pretrain_name", None) and hasattr(exp, "load_pretrained"):
            try:
                params = exp.load_pretrained(params)
                self.logger.info("loaded pretrained weights: %s", exp.pretrain_name)
            except FileNotFoundError:
                self.logger.warning("pretrain checkpoint not found; "
                                    "training from scratch")
        tx = exp.get_optimizer(self.batch_size, self.iters_per_epoch)
        state = TrainState.create(params, tx, use_ema=getattr(exp, "ema", True))
        if self.args.get("resume"):
            # reference resume_train (trainer.py:466-489): resume from
            # args.ckpt when given, else <output>/latest
            ckpt_dir, ckpt_name = self.output_dir, "latest"
            if self.args.get("ckpt"):
                ckpt_dir, ckpt_name = os.path.split(
                    os.path.abspath(self.args["ckpt"]))
            try:
                # Full resume restores model + optimizer + best_ap like the
                # reference (trainer.py:476-485): AdamW moments and the
                # MultiSteps accumulation counter continue, not restart.
                # Target-structured restore rebuilds the optax NamedTuple
                # opt_state tree; older checkpoints without opt_state fall
                # back to params-only with a warning.
                target = {
                    "params": state.params,
                    "ema_params": state.ema_params
                    if state.ema_params is not None else state.params,
                    "opt_state": state.opt_state,
                    "epoch": 0, "step": 0, "best_ap": 0.0,
                }
                try:
                    loaded = load_checkpoint(ckpt_dir, ckpt_name,
                                             target=target)
                    opt_state = loaded["opt_state"]
                except FileNotFoundError:
                    raise
                except Exception:
                    loaded = load_checkpoint(ckpt_dir, ckpt_name)
                    opt_state = state.opt_state
                    self.logger.warning(
                        "checkpoint has no (or mismatched) optimizer state; "
                        "resuming with fresh optimizer moments")
                loaded_step = int(loaded.get("step", 0))
                self.start_epoch = int(loaded.get("epoch", 0))
                if self.args.get("start_epoch") is not None:
                    # reference: args.start_epoch - 1 overrides the stored one
                    self.start_epoch = int(self.args["start_epoch"]) - 1
                boundary = self.start_epoch * self.iters_per_epoch
                if loaded_step > boundary:
                    # mid-epoch (preemption) checkpoint — step ran PAST the
                    # stored epoch's boundary because the epoch wasn't
                    # advanced: the epoch replays from iter 0, so rewind the
                    # step + LR-schedule counters to the boundary or the
                    # schedule runs up to one epoch ahead of the iteration
                    # count forever after. (step <= boundary means a normal
                    # epoch-boundary save: counters continue bit-identically.)
                    from .train_state import rewind_opt_counts

                    grad_acc = (int(getattr(exp, "grad_acc_step", 1))
                                if getattr(exp, "use_grad_acc", False) else 1)
                    opt_state = rewind_opt_counts(
                        opt_state, boundary // max(grad_acc, 1))
                    self.logger.info(
                        "mid-epoch checkpoint (step %d): rewound schedule "
                        "counters to the epoch-%d boundary (step %d) for the "
                        "replayed epoch", loaded_step, self.start_epoch,
                        boundary)
                    loaded_step = boundary
                state = state.replace(
                    params=loaded["params"], opt_state=opt_state,
                    # EMA stays disabled if the exp disabled it — the saved
                    # 'ema_params' is just a params copy in that case and
                    # must not re-enable per-step EMA maintenance
                    ema_params=loaded.get("ema_params", loaded["params"])
                    if state.ema_params is not None else None,
                    step=np.asarray(loaded_step, np.int32),
                )
                self.best_ap = float(loaded.get("best_ap", 0.0))
                self.logger.info("resumed from epoch %d (best_ap %.4f)",
                                 self.start_epoch, self.best_ap)
            except FileNotFoundError:
                if self.args.get("ckpt"):
                    # an EXPLICITLY named checkpoint that doesn't exist is
                    # an error — silently restarting a long run from
                    # scratch on a typo'd path would overwrite it
                    raise
                self.logger.info("no checkpoint to resume; starting fresh")
        elif self.args.get("ckpt"):
            # fine-tune load (reference trainer.py:494-499): params only,
            # shape-mismatch-tolerant, optimizer/epoch fresh
            from .checkpoint import load_matching

            ckpt_dir, ckpt_name = os.path.split(
                os.path.abspath(self.args["ckpt"]))
            loaded = load_checkpoint(ckpt_dir, ckpt_name)
            state = state.replace(
                params=load_matching(state.params, loaded["params"]))
            self.logger.info("loaded fine-tune checkpoint %s",
                             self.args["ckpt"])
        self.state = replicate_state(self.mesh, state)
        # multi-host: each process loads only its share of the global batch
        # (reference DistributedSampler role); shard_batch assembles the
        # global array from the local slices
        local_bs = self.batch_size // jax.process_count()
        self.loader = exp.get_data_loader(local_bs)
        if jax.process_count() > 1 and hasattr(self.loader, "set_rank"):
            # rank-disjoint sampling (reference DistributedSampler role):
            # without this every host draws the identical sample stream and
            # the global batch holds process_count copies of the same images
            self.loader.set_rank(jax.process_index(), jax.process_count())
        self._step_fns = {}
        self.step_fn = self._get_step_fn(self.input_size)
        # multiscale size list (reference multiscale_range in 32-px steps)
        rng_steps = int(getattr(exp, "multiscale_range", 0))
        self.size_list = [
            (self.input_size[0] + 32 * d,
             int(round((self.input_size[1] + 32 * d * self.input_size[1]
                        / self.input_size[0]) / 32)) * 32)
            for d in range(-rng_steps, rng_steps + 1)
        ] if rng_steps else [self.input_size]

    def _get_step_fn(self, size):
        size = tuple(size)
        if size not in self._step_fns:
            exp = self.exp
            if exp.task in ("uni", "inst") and hasattr(exp, "get_train_step"):
                old = exp.input_size
                exp.input_size = size
                self._step_fns[size] = exp.get_train_step(self.batch_size)
                exp.input_size = old
            else:
                from .train_step import make_det_train_step

                self._step_fns[size] = make_det_train_step(
                    self.model, size,
                    use_l1=getattr(exp, "always_l1", False) or self.no_aug)
        return self._step_fns[size]

    def before_epoch(self):
        """No-aug transition (reference trainer.py before_epoch): at
        max_epoch - no_aug_epochs, close mosaic/mixup and switch the det loss
        to L1 for the remaining epochs."""
        exp = self.exp
        no_aug = int(getattr(exp, "no_aug_epochs", 0))
        if self.no_aug or not no_aug or \
                self.epoch < self.max_epoch - no_aug:
            return
        self.no_aug = True
        self.logger.info("epoch %d: closing mosaic/mixup, enabling L1 "
                         "(no-aug final epochs)", self.epoch)
        for obj in (getattr(self.loader, "dataset", None), self.loader):
            if hasattr(obj, "close_mosaic"):
                obj.close_mosaic()
                break
        # The reference flips head.use_l1=True on EVERY head type at no-aug
        # (trainer.py:387-391); the uni/inst step fns read exp.always_l1, so
        # flip it before the rebuild or their recompile changes nothing.
        if hasattr(exp, "always_l1"):
            exp.always_l1 = True
        self._step_fns = {}  # rebuild step fns with use_l1=True
        self.save_ckpt("last_mosaic_epoch")

    def train_in_epoch(self):
        t_data = t_step = 0.0
        it = iter(self.loader)
        for self.iter in range(self.iters_per_epoch):
            t0 = time.time()
            batch = next(it)
            batch = shard_batch(self.mesh, batch)
            t1 = time.time()
            if getattr(self.exp, "debug_only", False) and self.iter == 0:
                from ..utils.debug_dump import dump_uni_batch

                if self.exp.task == "uni":
                    dump_uni_batch(os.path.join(self.output_dir, "debug_data"),
                                   *batch[:3],
                                   masks=batch[3] if len(batch) == 4 else None)
                self.logger.info("debug_only: dumped first batch to %s; "
                                 "stopping", self.output_dir)
                return
            cur_size = tuple(batch[0].shape[-3:-1])
            self.step_fn = self._get_step_fn(cur_size)
            if self.exp.task == "uni" and len(batch) == 4:
                images, targets, task_ids, masks = batch
                self.state, loss_dict = self.step_fn(
                    self.state, images, targets, task_ids, masks)
            elif self.exp.task == "uni":
                images, targets, task_ids = batch
                self.state, loss_dict = self.step_fn(
                    self.state, images, targets, task_ids)
            elif self.exp.task == "inst":
                images, labels, masks = batch
                self.state, loss_dict = self.step_fn(
                    self.state, images, labels[..., :5], masks)
            else:
                images, labels = batch
                self.state, loss_dict = self.step_fn(self.state, images, labels)
            t2 = time.time()
            t_data += t1 - t0
            t_step += t2 - t1
            if self._preempted is not None:
                self.logger.warning(
                    "signal %s received: writing preemption checkpoint "
                    "(epoch %d, iter %d) and stopping",
                    self._preempted, self.epoch, self.iter + 1)
                # an async 'latest' save from after_epoch may still be
                # in flight on a DIFFERENT checkpointer; writing the same
                # path concurrently could finalize the stale one over the
                # fresh one — drain it first
                from .checkpoint import wait_for_checkpoints

                wait_for_checkpoints()
                # epoch NOT advanced: resume restarts this epoch
                self.save_ckpt("latest", epoch=self.epoch, blocking=True)
                return
            if (self.iter + 1) % 10 == 0 and len(self.size_list) > 1 and \
                    hasattr(self.loader, "set_input_size"):
                # deterministic in (epoch, iter): every host picks the SAME
                # size with no collective — the reference instead broadcasts
                # rank 0's draw (exp/unicorn_track.py:349-354)
                seed = ((self.exp.seed or 0) * 1000003
                        + self.epoch * 100003 + self.iter) % (2 ** 32)
                idx = np.random.RandomState(seed).randint(len(self.size_list))
                self.loader.set_input_size(self.size_list[idx])
            if (self.iter + 1) % self.exp.print_interval == 0:
                losses = {k: float(v) for k, v in loss_dict.items()}
                self._log_metrics({"epoch": self.epoch, "iter": self.iter + 1,
                                   **losses})
                left = (self.iters_per_epoch - self.iter - 1) \
                    + (self.max_epoch - self.epoch - 1) * self.iters_per_epoch
                eta = left * (t_step + t_data) / max(self.iter + 1, 1)
                self.logger.info(
                    "epoch %d iter %d/%d  total=%.3f  data %.2fs step %.2fs "
                    "ETA %.0fmin  %s",
                    self.epoch, self.iter + 1, self.iters_per_epoch,
                    losses.get("total_loss", 0.0), t_data, t_step, eta / 60,
                    {k: round(v, 3) for k, v in losses.items()
                     if k != "total_loss"},
                )

    def after_epoch(self):
        import jax

        self.save_ckpt("latest")
        if jax.process_index() != 0:
            # in-training eval is local (mesh=None evaluator) and best-ckpt
            # saving is rank-0-only: other hosts would just duplicate the
            # full eval forward pass and interleave metrics.jsonl records
            return
        if (self.epoch + 1) % self.exp.eval_interval == 0:
            try:
                self.evaluate_and_save_best()
            except NotImplementedError:
                # exp defines no evaluator (BaseExp.get_evaluator raises):
                # in-training eval simply doesn't apply — not an error
                self.logger.debug("exp has no evaluator; skipping "
                                  "in-training eval")
            except Exception:  # eval must not kill training
                self.logger.warning("in-training eval failed", exc_info=True)

    def evaluate_and_save_best(self):
        """In-training COCO eval + best checkpoint (trainer.py:503-526)."""
        import jax

        from ..models.heads import decode_for_inference

        evaluator = self.exp.get_trainer_evaluator()
        model = self.model

        from ..evaluators.coco_inst_evaluator import COCOInstEvaluator

        if isinstance(evaluator, COCOInstEvaluator):
            # mask exps: the inst evaluator consumes the decode+NMS+CondInst
            # forward ((dets, valid, masks) per image), not the det decode
            forward = self.exp.get_inst_forward(model)
        else:
            @jax.jit
            def forward(params, images):
                raw = model.apply(params, images)
                if isinstance(raw, tuple):
                    raw = raw[0]
                return decode_for_inference(raw, (8, 16, 32), mode="mot")

        params = self.state.ema_params or self.state.params
        metrics = evaluator.evaluate(forward, params, max_images=1000)
        # det evals report "AP"; the inst evaluator prefixes ("mask_AP"
        # when gt has masks, else "box_AP")
        ap = metrics.get("AP", metrics.get("mask_AP",
                                           metrics.get("box_AP", 0.0)))
        self.logger.info("eval: %s", metrics)
        self._log_metrics({"epoch": self.epoch, "eval": True,
                           **{k: float(v) for k, v in metrics.items()
                              if isinstance(v, (int, float))}})
        if ap > self.best_ap:
            self.best_ap = ap
            self.save_ckpt("best")

    def _log_metrics(self, record):
        """Scalar metrics to metrics.jsonl (role of the reference's
        TensorBoard scalars, trainer.py:359-361). Rank-0 only: multihost
        runs share the output dir and interleaved appends from every
        process would corrupt the stream."""
        import json

        import jax

        if jax.process_index() != 0:
            return
        with open(os.path.join(self.output_dir, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    def save_ckpt(self, name, epoch=None, blocking=False):
        import jax

        if jax.process_index() != 0:
            return  # rank-0-only save (reference trainer.py:528-543)
        epoch = self.epoch + 1 if epoch is None else epoch
        state = jax.device_get(self.state)
        save_checkpoint(self.output_dir, {
            "params": state.params,
            "ema_params": state.ema_params if state.ema_params is not None
            else state.params,
            "opt_state": state.opt_state,
            "epoch": epoch,
            "step": int(state.step),
            "best_ap": float(self.best_ap),
        }, name, blocking=blocking)  # async by default; train() waits on exit
        self.logger.info("saved checkpoint %s (epoch %d)", name, epoch)
