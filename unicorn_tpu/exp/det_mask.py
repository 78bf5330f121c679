"""Instance-segmentation pretraining experiment.

Reference: unicorn/exp/unicorn_det_mask.py:22-… (ExpDetMask: freezes the
detector, trains the CondInst branch only). In the functional train state the
freeze is an optimizer mask (zero updates for non-mask params) instead of
requires_grad flags.
"""
from __future__ import annotations

from .det import ExpDet

MASK_PARAM_KEYS = ("controller", "mask_branch")


def mask_only_trainable(params):
    """Optax mask: True where the param belongs to the CondInst branch."""
    import jax

    def is_mask_param(path):
        joined = "/".join(str(p) for p in path)
        return any(k in joined for k in MASK_PARAM_KEYS)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params),
        [is_mask_param([getattr(k, "key", getattr(k, "idx", k)) for k in path])
         for path, _ in flat],
    )


class ExpDetMask(ExpDet):
    def __init__(self):
        super().__init__()
        self.task = "inst"
        self.exp_name = "unicorn_inst"
        self.train_mask_only = True
        self.d_rate = 4
        # BoxInst box-supervised masks (losses/boxinst.py); mirrors the
        # reference's cfg MODEL.BOXINST.* defaults (disabled)
        self.boxinst = False
        self.boxinst_warmup_iters = 10000
        self.max_epoch = 12
        self.pretrain_name = "unicorn_det_convnext_tiny_800x1280"

    def get_model(self):
        import jax.numpy as jnp

        from ..models.unicorn import YOLOXDet

        return YOLOXDet(
            num_classes=self.num_classes, depth=self.depth, width=self.width,
            in_channels=tuple(self.in_channels), backbone_name=self.backbone_name,
            act=self.act, use_attention=self.use_attention,
            n_layer_att=self.n_layer_att, use_mask=True,
            remat=self.remat,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )

    def get_data_loader(self, batch_size, is_distributed=False):
        import os

        from ..data.datasets.vos import COCOMOTSDataset
        from ..data.loader import InstLoader
        from ..data.transforms import TrainTransformIns
        from .det import get_unicorn_datadir

        data_dir = self.data_dir or os.path.join(get_unicorn_datadir(), "coco")
        dataset = COCOMOTSDataset(data_dir, self.train_ann, self.train_name)
        return InstLoader(
            dataset,
            TrainTransformIns(max_labels=self.max_labels,
                              flip_prob=self.flip_prob,
                              hsv_prob=self.hsv_prob, d_rate=self.d_rate),
            batch_size, self.input_size,
        )

    def get_evaluator(self, batch_size=1, mesh=None):
        # mesh accepted for signature compatibility; the inst evaluator runs
        # single-device (per-instance dynamic-conv decode is batch-1)
        from ..evaluators.coco_inst_evaluator import COCOInstEvaluator

        return COCOInstEvaluator(
            dataset=self.get_eval_dataset(), img_size=self.test_size,
            conf_thre=self.test_conf, nms_thre=self.nmsthre,
            num_classes=self.num_classes, d_rate=self.d_rate,
        )

    def get_inst_forward(self, model):
        """Jitted decode+NMS+CondInst mask forward for eval
        (reference utils/boxes.py:80-153 postprocess_inst role)."""
        from ..drivers.inst import make_inst_forward

        return make_inst_forward(
            model, num_classes=self.num_classes, conf_thre=self.test_conf,
            nms_thre=self.nmsthre, use_raft=getattr(self, "use_raft", False),
            up_rate=getattr(self, "up_rate", 8 // self.d_rate),
        )

    def get_train_step(self, batch_size):
        from ..core.train_step import make_det_mask_train_step

        return make_det_mask_train_step(
            self.get_model(), self.input_size,
            use_l1=getattr(self, "always_l1", False),
            # box-supervised BoxInst branch (reference cfg
            # MODEL.BOXINST.ENABLED; off by default there too)
            boxinst=getattr(self, "boxinst", False),
            boxinst_warmup_iters=getattr(self, "boxinst_warmup_iters", 10000),
            d_rate=self.d_rate)

    def load_pretrained(self, params):
        """COCO detector -> inst-stage init: copy every shape-matching
        tensor from the det checkpoint (backbone/FPN/det head); the CondInst
        controller/mask branch stays at init — it is the only trainable part
        (the reference ExpDetMask loads the det checkpoint and freezes the
        detector). Without this hook the Trainer's pretrain load (gated on
        hasattr(exp, 'load_pretrained')) silently skips, and train_mask_only
        would train CondInst against a frozen RANDOM detector."""
        import os

        from ..core.checkpoint import load_checkpoint, load_matching

        ckpt_dir = os.path.join(os.getcwd(), "Unicorn_outputs",
                                self.pretrain_name)
        det = load_checkpoint(ckpt_dir)
        return load_matching(params, det.get("ema_params", det["params"]))

    def get_optimizer(self, batch_size, iters_per_epoch=1000):
        import optax

        from ..core.train_state import default_wd_mask, make_optimizer

        tx = make_optimizer(
            self.get_lr_fn(batch_size, iters_per_epoch), kind="sgd",
            weight_decay=self.weight_decay, momentum=self.momentum,
            no_decay_mask_fn=default_wd_mask,
            grad_accum=self.grad_acc_step if self.use_grad_acc else 1,
        )
        if self.train_mask_only:
            # zero out updates for frozen (non-CondInst) params
            tx = optax.chain(tx, optax.masked(
                optax.set_to_zero(),
                lambda params: _invert(mask_only_trainable(params)),
            ))
        return tx


def _invert(tree):
    import jax

    return jax.tree_util.tree_map(lambda b: not b, tree)
