"""Unified SOT+MOT experiment (task="uni").

Reference: unicorn/exp/unicorn_track.py:30-447 (ExpTrack): Unicorn model,
alternating-task omni loader, AdamW, COCO-pretrained head remap, GN.
"""
from __future__ import annotations

import os

from .base import BaseExp
from .det import get_unicorn_datadir


class ExpTrack(BaseExp):
    def __init__(self):
        super().__init__()
        self.task = "uni"
        self.exp_name = "unicorn_track"
        # ---------------- model config ---------------- #
        self.num_classes = 8
        self.depth = 1.0
        self.width = 1.0
        self.act = "silu"
        self.backbone_name = "convnext_tiny"
        self.in_channels = [192, 384, 768]
        self.embed_dim = 128
        self.interact_mode = "deform"
        self.use_attention = True
        self.n_layer_att = 3
        self.unshared_obj = True
        self.unshared_reg = True
        self.fuse_method = "sum"
        self.learnable_fuse = True
        self.bf16 = True
        # serve interaction/correlation in bf16 (the reference itself
        # serves fp16 correlation, unicorn_sot.py:94-97); training keeps
        # the fp32 autocast-off region either way
        self.serve_interact_bf16 = True
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
        self.input_size = (800, 1280)
        self.multiscale_range = 2
        self.data_dir = None
        self.max_labels = 100
        # --------------- transform config ----------------- #
        self.mosaic_prob = -1.0
        self.mixup_prob = 1.0
        self.hsv_prob = 1.0
        self.flip_prob = 0.5
        self.degrees = 10.0
        self.translate = 0.1
        self.mosaic_scale = (0.1, 2)
        self.mixup_scale = (0.5, 1.5)
        self.shear = 2.0
        self.enable_mixup = True
        # --------------  training config --------------------- #
        self.warmup_epochs = 1
        self.max_epoch = 15
        self.warmup_lr = 0
        self.basic_lr_per_img = 5e-4 / 64.0
        self.scheduler = "yoloxwarmcos"
        self.no_aug_epochs = 3
        self.min_lr_ratio = 0.1
        self.ema = True
        self.mhs = True
        self.weight_decay = 5e-4
        self.print_interval = 15
        self.debug_only = False
        self.eval_interval = 10
        self.samples_per_epoch = 200000
        self.always_l1 = True
        self.use_grad_acc = True
        self.grad_acc_step = 2
        self.grid_sample = True
        self.bidirect = True
        self.train_mode = "alter"
        self.alter_step = 1
        self.mot_weight = 3
        self.scale_all_mot = True
        self.pretrain_name = "unicorn_det_convnext_tiny_800x1280"
        # -----------------  testing config ------------------ #
        self.test_size = (800, 1280)
        self.test_conf = 0.01
        self.nmsthre = 0.65
        self.test_ann = "test.json"
        self.test_name = "test"
        # in-training eval root (reference unicorn_track.py:109: the MOT
        # Challenge COCO-format val, even for BDD-trained exps)
        self.test_data_dir = None  # defaults to $UNICORN_DATADIR/mot
        # -----------------  other config ------------------ #
        self.sot_only = False
        self.mot_only = False
        self.mot_test_name = "bdd100k"  # "bdd100k" or "motchallenge"
        # COCO train split feeding COCOSOT (reference unicorn_track.py:283-287
        # inherits these from the det exp)
        self.train_ann = "instances_train2017.json"
        self.train_name = "train2017"

    # ---- factories ----

    def get_model(self):
        import jax.numpy as jnp

        from ..models.unicorn import Unicorn

        return Unicorn(
            num_classes=self.num_classes, depth=self.depth, width=self.width,
            in_channels=tuple(self.in_channels), backbone_name=self.backbone_name,
            act=self.act, interact_mode=self.interact_mode,
            embed_dim=self.embed_dim, use_attention=self.use_attention,
            n_layer_att=self.n_layer_att, unshared_obj=self.unshared_obj,
            unshared_reg=self.unshared_reg, fuse_method=self.fuse_method,
            learnable_fuse=self.learnable_fuse,
            remat=self.remat,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )

    def load_pretrained(self, params):
        """COCO det -> uni weight surgery (unicorn_track.py:157-192):
        cls_preds remapped 80->8 via class-index gather [0,0,2,7,5,6,3,1]
        (or 80->1 via [0]), obj/reg preds duplicated into the *_sot branches.
        """
        import jax.numpy as jnp
        import numpy as np

        from ..core.checkpoint import load_checkpoint

        ckpt_dir = os.path.join(os.getcwd(), "Unicorn_outputs",
                                self.pretrain_name)
        det_params = load_checkpoint(ckpt_dir)["params"]
        flat_det = _flatten(det_params)
        flat_uni = _flatten(params)
        gather = [0, 0, 2, 7, 5, 6, 3, 1] if self.num_classes == 8 else [0]
        n_copied = 0
        for k, v in flat_det.items():
            if k not in flat_uni:
                continue
            tgt = flat_uni[k]
            if "cls_pred" in "/".join(k) and tgt.shape != v.shape:
                # channel-gather the class dimension (last axis)
                v = np.asarray(v)[..., gather]
            if tuple(tgt.shape) == tuple(v.shape):
                flat_uni[k] = jnp.asarray(v)
                n_copied += 1
            # duplicate shared preds into SOT branches
        for k in list(flat_uni.keys()):
            joined = "/".join(k)
            for src_name, dst_name in (("obj_pred", "obj_pred_sot"),
                                       ("reg_pred", "reg_pred_sot")):
                if dst_name in joined:
                    src_k = tuple(p.replace(dst_name, src_name) for p in k)
                    if src_k in flat_det and \
                            tuple(flat_det[src_k].shape) == tuple(flat_uni[k].shape):
                        flat_uni[k] = jnp.asarray(flat_det[src_k])
        return _unflatten(flat_uni)

    def get_dataset(self, sot_datasets=None, mot_datasets=None):
        """Build the alternating OmniDatasetPlus with the reference's full
        default training mix (unicorn_track.py:283-332):

        - SOT group: COCOSOT + LaSOT + GOT10K + TrackingNet, weights [1,1,1,1]
        - MOT group, ``mot_test_name == "bdd100k"``: BDD100K, weight [1]
        - MOT group, ``mot_test_name == "motchallenge"``: MOT17 + CrowdHuman +
          CityPersons + ETHZ, weights **[2, 6, 1, 1]** (unicorn_track.py:330)

        Dataset roots resolve under UNICORN_DATADIR. A dataset whose files
        are absent is skipped with a LOGGED warning (partial-data
        environments still train, on a renormalized weight vector); any
        other loader error (bad json, schema drift) propagates instead of
        silently shrinking the mix."""
        from ..data.datasets.omni import OmniDataset, OmniDatasetPlus

        root = get_unicorn_datadir()
        sot_weights = mot_weights = None
        # check the ablation flags BEFORE building: _build_group parses every
        # annotation index (minutes of I/O on the full mixes) — building a
        # group only to discard it would pay that on every launch
        if self.mot_only:
            sot_datasets = []
        if self.sot_only:
            mot_datasets = []
        if sot_datasets is None:
            sot_datasets, sot_weights = self._build_group(
                self._sot_dataset_specs(root))
        if mot_datasets is None:
            mot_datasets, mot_weights = self._build_group(
                self._mot_dataset_specs(root))
        sot = OmniDataset(sot_datasets, p_datasets=sot_weights,
                          samples_per_epoch=self.samples_per_epoch // 2) \
            if sot_datasets else None
        mot = OmniDataset(mot_datasets, p_datasets=mot_weights,
                          samples_per_epoch=self.samples_per_epoch // 2) \
            if mot_datasets else None
        return OmniDatasetPlus(sot, mot, self.samples_per_epoch,
                               mode=self.train_mode)

    def _sot_dataset_specs(self, root):
        """(name, weight, builder) triples for the SOT group
        (reference get_sot_dataset, unicorn_track.py:283-300)."""
        from ..data.datasets.sot import COCOSOT, Got10k, Lasot, TrackingNet

        def coco_sot():
            from ..data.datasets.coco import COCODataset

            return COCOSOT(COCODataset(
                data_dir=self.data_dir or os.path.join(root, "coco"),
                json_file=self.train_ann, name=self.train_name,
                img_size=self.input_size))

        return [
            ("COCOSOT", 1, coco_sot),
            ("LaSOT", 1, lambda: Lasot(os.path.join(root, "LaSOT"))),
            ("GOT10K", 1,
             lambda: Got10k(os.path.join(root, "GOT10K", "train"))),
            ("TrackingNet", 1,
             lambda: TrackingNet(os.path.join(root, "TrackingNet"))),
        ]

    def _mot_dataset_specs(self, root):
        """(name, weight, builder) triples for the MOT group
        (reference get_mot_dataset, unicorn_track.py:304-332)."""
        from ..data.datasets.mot import MOTOmniDataset

        if self.mot_test_name == "bdd100k":
            from ..data.datasets.bdd import BDDOmniDataset

            return [("BDD100K", 1, lambda: BDDOmniDataset(
                os.path.join(root, "bdd100k"), "train"))]
        if self.mot_test_name == "motchallenge":
            return [
                ("MOT17", 2, lambda: MOTOmniDataset(
                    os.path.join(root, "mot"), "train_omni.json", "train")),
                ("CrowdHuman", 6, lambda: MOTOmniDataset(
                    os.path.join(root, "crowdhuman"), "train.json",
                    "CrowdHuman_train")),
                ("CityPersons", 1, lambda: MOTOmniDataset(
                    os.path.join(root, "Cityscapes"), "train.json", None,
                    img_root=os.path.join(root, "Cityscapes"))),
                ("ETHZ", 1, lambda: MOTOmniDataset(
                    os.path.join(root, "ETHZ"), "train.json", None,
                    img_root=os.path.join(root, "ETHZ"))),
            ]
        raise ValueError(f"Unsupported mot_test_name: {self.mot_test_name}")

    @staticmethod
    def _build_group(specs):
        """Instantiate (name, weight, builder) specs, skipping — loudly —
        only datasets whose files are missing."""
        import logging

        log = logging.getLogger("unicorn_tpu")
        datasets, weights = [], []
        for name, weight, build in specs:
            try:
                ds = build()
            except (FileNotFoundError, NotADirectoryError) as e:
                log.warning("training mix: %s not found (%s); skipped",
                            name, e)
                continue
            if len(ds) == 0:
                log.warning("training mix: %s is empty; skipped", name)
                continue
            datasets.append(ds)
            weights.append(weight)
        return datasets, (weights or None)

    def get_data_loader(self, batch_size, is_distributed=False):
        from ..data.loader import UniLoader
        from ..data.transforms import TrainTransformOmni

        return UniLoader(
            self.get_dataset(),
            TrainTransformOmni(max_labels=self.max_labels,
                               flip_prob=self.flip_prob, hsv_prob=self.hsv_prob),
            batch_size, self.input_size, alter_every=self.alter_step,
        )

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

    def get_optimizer(self, batch_size, iters_per_epoch=12500):
        from ..core.train_state import default_wd_mask, make_optimizer

        return make_optimizer(
            self.get_lr_fn(batch_size, iters_per_epoch), kind="adamw",
            weight_decay=self.weight_decay,
            grad_accum=self.grad_acc_step if self.use_grad_acc else 1,
            no_decay_mask_fn=default_wd_mask,
        )

    def get_train_step(self, batch_size):
        from ..core.train_step import make_uni_train_step

        return make_uni_train_step(
            self.get_model(), self.input_size,
            mot_weight=float(self.mot_weight) if self.scale_all_mot else 1.0,
            bidirect=self.bidirect, use_l1=self.always_l1,
            num_classes=self.num_classes, mhs=self.mhs,
        )

    def get_evaluator(self, batch_size=1, mesh=None):
        # mesh accepted for tools/eval.py uniformity; MOT eval is a
        # sequential per-video path so the mesh is unused here
        from ..evaluators.mot_evaluator import MOTEvaluator

        return MOTEvaluator(exp=self)

    def get_trainer_evaluator(self, batch_size=1):
        """In-training box-AP eval over the COCO-format MOT val set (the
        reference uni trainer runs a COCOEvaluator on MOTDataset during
        tracking training, unicorn_track.py:402-443); the MOT-metrics
        evaluator above is the tools/track.py path."""
        from ..data.datasets.coco import COCODataset
        from ..data.transforms import ValTransform
        from ..evaluators.coco_evaluator import COCOEvaluator

        data_dir = getattr(self, "test_data_dir", None) or os.path.join(
            get_unicorn_datadir(), "mot")
        ds = COCODataset(
            data_dir=data_dir, json_file=self.test_ann, name=self.test_name,
            img_size=self.test_size, preproc=ValTransform(),
        )
        return COCOEvaluator(
            ds, self.test_size, conf_thre=self.test_conf,
            nms_thre=self.nmsthre, num_classes=self.num_classes,
            batch_size=batch_size,
        )

    def eval(self, model, params, evaluator):
        return evaluator.evaluate(model, params)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    out = {}
    for k, v in flat.items():
        d = out
        for p in k[:-1]:
            d = d.setdefault(p, {})
        d[k[-1]] = v
    return out
