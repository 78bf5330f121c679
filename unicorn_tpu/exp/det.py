"""Detection pretraining experiment (COCO).

Reference: unicorn/exp/unicorn_det.py:21-210 (ExpDet). Differences by design:
GroupNorm instead of BN (no sync needed under pjit), AdamW-style optax
optimizers, data loading via the numpy loader + mesh sharding.
"""
from __future__ import annotations

import os

from .base import BaseExp


def get_unicorn_datadir():
    """Dataset root (reference data/dataloading.py:26-38, env YOLOX_DATADIR)."""
    return os.environ.get(
        "UNICORN_DATADIR",
        os.environ.get("YOLOX_DATADIR", os.path.join(os.getcwd(), "datasets")),
    )


class ExpDet(BaseExp):
    def __init__(self):
        super().__init__()
        self.task = "det"
        # ---------------- model config ---------------- #
        self.num_classes = 80
        self.depth = 1.0
        self.width = 1.0
        self.act = "silu"
        self.backbone_name = "convnext_tiny"
        self.in_channels = [192, 384, 768]
        self.use_attention = True
        self.n_layer_att = 3
        self.bf16 = True
        # backbone remat: False | True (full block) | "dw" (selective —
        # saves the VPU-serial dw7x7 output, recomputes the cheap MLP tail;
        # measured B=4 800x1280: 114.9 vs 118.3 ms/sample vs full remat).
        # Numerically identical either way; original note:
        # backbone block remat: numerically identical, ~6-12% step-time cost,
        # cuts activation residency ~40% (measured 800x1280 v5e: B=1 temp
        # 5.4->3.1 GB). Off for tiny (fits to B=2); large configs enable it.
        self.remat = False
        # ---------------- dataloader config ---------------- #
        self.data_num_workers = 1
        self.input_size = (640, 640)
        self.multiscale_range = 5
        self.data_dir = None
        self.train_ann = "instances_train2017.json"
        self.train_name = "train2017"
        self.val_ann = "instances_val2017.json"
        self.val_name = "val2017"
        # --------------- transform config ----------------- #
        self.mosaic_prob = 1.0
        self.mixup_prob = 1.0
        self.hsv_prob = 1.0
        self.flip_prob = 0.5
        self.degrees = 10.0
        self.translate = 0.1
        self.mosaic_scale = (0.1, 2)
        self.mixup_scale = (0.5, 1.5)
        self.shear = 2.0
        self.enable_mixup = True
        self.max_labels = 120
        # --------------  training config --------------------- #
        self.warmup_epochs = 1
        self.max_epoch = 100
        self.warmup_lr = 0
        self.basic_lr_per_img = 1e-3 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 5
        self.min_lr_ratio = 0.025
        self.ema = True
        self.always_l1 = False
        self.weight_decay = 5e-2
        self.momentum = 0.9
        self.print_interval = 10
        self.debug_only = False
        self.eval_interval = 10
        self.use_grad_acc = False
        self.grad_acc_step = 1
        self.exp_name = "unicorn_det"
        # -----------------  testing config ------------------ #
        self.test_size = (640, 640)
        self.test_conf = 0.01
        self.nmsthre = 0.65

    # ---- factories ----

    def get_model(self):
        import jax.numpy as jnp

        from ..models.unicorn import YOLOXDet

        return YOLOXDet(
            num_classes=self.num_classes, depth=self.depth, width=self.width,
            in_channels=tuple(self.in_channels), backbone_name=self.backbone_name,
            act=self.act, use_attention=self.use_attention,
            n_layer_att=self.n_layer_att,
            remat=self.remat,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )

    def get_dataset(self):
        from ..data.datasets.coco import COCODataset
        from ..data.transforms import TrainTransform

        data_dir = self.data_dir or os.path.join(get_unicorn_datadir(), "coco")
        return COCODataset(
            data_dir=data_dir, json_file=self.train_ann, name=self.train_name,
            img_size=self.input_size,
            preproc=TrainTransform(max_labels=self.max_labels,
                                   flip_prob=self.flip_prob,
                                   hsv_prob=self.hsv_prob),
        )

    def get_data_loader(self, batch_size, is_distributed=False):
        from ..data.loader import DetLoader

        dataset = self.get_dataset()
        if self.mosaic_prob > 0:
            from ..data.mosaic import MosaicDetection
            from ..data.transforms import TrainTransform

            dataset = MosaicDetection(
                dataset,  # mosaic pulls raw items via pull_item
                img_size=self.input_size,
                preproc=TrainTransform(max_labels=self.max_labels,
                                       flip_prob=self.flip_prob,
                                       hsv_prob=self.hsv_prob),
                mosaic_prob=self.mosaic_prob, mixup_prob=self.mixup_prob,
                degrees=self.degrees, translate=self.translate,
                mosaic_scale=self.mosaic_scale, mixup_scale=self.mixup_scale,
                shear=self.shear, enable_mixup=self.enable_mixup,
            )
        return DetLoader(dataset, batch_size)

    def get_lr_fn(self, batch_size, iters_per_epoch):
        from ..core.schedule import yolox_warm_cos_lr

        lr = self.basic_lr_per_img * batch_size

        def lr_fn(step):
            return yolox_warm_cos_lr(
                lr, self.min_lr_ratio,
                total_iters=self.max_epoch * iters_per_epoch,
                warmup_total_iters=self.warmup_epochs * iters_per_epoch,
                warmup_lr_start=self.warmup_lr,
                no_aug_iter=self.no_aug_epochs * iters_per_epoch,
                iters=step,
            )

        return lr_fn

    def get_optimizer(self, batch_size, iters_per_epoch=1000):
        from ..core.train_state import default_wd_mask, make_optimizer

        return make_optimizer(
            self.get_lr_fn(batch_size, iters_per_epoch), kind="sgd",
            weight_decay=self.weight_decay, momentum=self.momentum,
            grad_accum=self.grad_acc_step if self.use_grad_acc else 1,
            no_decay_mask_fn=default_wd_mask,
        )

    def get_eval_dataset(self):
        from ..data.datasets.coco import COCODataset
        from ..data.transforms import ValTransform

        data_dir = self.data_dir or os.path.join(get_unicorn_datadir(), "coco")
        return COCODataset(
            data_dir=data_dir, json_file=self.val_ann, name=self.val_name,
            img_size=self.test_size, preproc=ValTransform(),
        )

    def get_evaluator(self, batch_size=1, mesh=None):
        """mesh: optional ("data",) mesh — eval batches shard across it
        (reference distributed-eval role); batch_size must divide evenly."""
        from ..evaluators.coco_evaluator import COCOEvaluator

        return COCOEvaluator(
            dataset=self.get_eval_dataset(), img_size=self.test_size,
            conf_thre=self.test_conf, nms_thre=self.nmsthre,
            num_classes=self.num_classes, batch_size=batch_size, mesh=mesh,
        )

    def eval(self, model, params, evaluator):
        return evaluator.evaluate(model, params)
