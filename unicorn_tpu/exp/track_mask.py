"""Unified VOS+MOTS experiment (mask stage).

Reference: unicorn/exp/unicorn_track_mask.py:31-220 (ExpTrackMask): loads the
SOT-MOT weights, trains ONLY head.controllers + mask_branch
(:92-96, via optimizer masking here), use_raft convex upsampling, d_rate=2,
ema off.
"""
from __future__ import annotations

from .track import ExpTrack

MASK_PARAM_KEYS = ("controller", "mask_branch")


class ExpTrackMask(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = "unicorn_track_mask"
        self.use_raft = True
        self.d_rate = 2
        self.up_rate = 8 // self.d_rate  # reference unicorn_track_mask.py:64
        self.ema = False
        self.train_mask_only = True
        self.max_epoch = 5
        self.samples_per_epoch = 100000
        self.mhs = False
        self.pretrain_name = "unicorn_track_tiny"

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
            learnable_fuse=self.learnable_fuse, use_mask=True,
            use_raft=self.use_raft, up_rate=self.up_rate,
            remat=self.remat,
            dtype=jnp.bfloat16 if self.bf16 else jnp.float32,
        )

    def get_optimizer(self, batch_size, iters_per_epoch=12500):
        import jax
        import optax

        from ..core.train_state import default_wd_mask, make_optimizer

        tx = make_optimizer(
            self.get_lr_fn(batch_size, iters_per_epoch), kind="adamw",
            weight_decay=self.weight_decay,
            grad_accum=self.grad_acc_step if self.use_grad_acc else 1,
            no_decay_mask_fn=default_wd_mask,
        )
        if self.train_mask_only:
            def frozen_mask(params):
                def is_frozen(path):
                    joined = "/".join(str(getattr(p, "key", p)) for p in path)
                    return not any(k in joined for k in MASK_PARAM_KEYS)

                flat, tree = jax.tree_util.tree_flatten_with_path(params)
                return jax.tree_util.tree_unflatten(
                    tree, [is_frozen(path) for path, _ in flat])

            tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
        return tx

    def get_dataset(self, vos_datasets=None, mots_datasets=None):
        """Mask-stage mix (reference unicorn_track_mask.py:187-229):

        - VOS group: COCO-inst + Saliency + DAVIS + YouTubeVOS [1,1,1,1]
        - MOTS group, bdd100k: BDD seg_track_20 [1]
        - MOTS group, motchallenge: COCO-person + MOTS-Challenge [1,1]

        Missing dataset roots are skipped with a logged warning; other
        loader errors propagate (same policy as ExpTrack.get_dataset)."""
        from ..data.datasets.omni import OmniDataset, OmniDatasetPlus

        from .det import get_unicorn_datadir

        root = get_unicorn_datadir()
        vos_weights = mots_weights = None
        # ablation flags first: don't pay a full group's annotation parse
        # only to discard it (see ExpTrack.get_dataset)
        if self.mot_only:
            vos_datasets = []
        if self.sot_only:
            mots_datasets = []
        if vos_datasets is None:
            vos_datasets, vos_weights = self._build_group(
                self._vos_dataset_specs(root))
        if mots_datasets is None:
            mots_datasets, mots_weights = self._build_group(
                self._mots_dataset_specs(root))
        vos = OmniDataset(vos_datasets, p_datasets=vos_weights,
                          samples_per_epoch=self.samples_per_epoch // 2) \
            if vos_datasets else None
        mots = OmniDataset(mots_datasets, p_datasets=mots_weights,
                           samples_per_epoch=self.samples_per_epoch // 2) \
            if mots_datasets else None
        return OmniDatasetPlus(vos, mots, self.samples_per_epoch,
                               mode=self.train_mode)

    def _vos_dataset_specs(self, root):
        """(name, weight, builder) for the VOS group (reference
        get_sot_dataset of the mask exp, unicorn_track_mask.py:187-200)."""
        import os

        from ..data.datasets.vos import (
            COCOMOTSDataset,
            DAVISTrainDataset,
            SaliencyDataset,
            YoutubeVOSDataset,
        )

        return [
            ("COCO-inst", 1, lambda: COCOMOTSDataset(
                self.data_dir or os.path.join(root, "coco"),
                json_file=self.train_ann, name=self.train_name)),
            ("Saliency", 1,
             lambda: SaliencyDataset(os.path.join(root, "saliency"))),
            ("DAVIS", 1,
             lambda: DAVISTrainDataset(os.path.join(root, "DAVIS"))),
            ("YouTubeVOS", 1,
             lambda: YoutubeVOSDataset(os.path.join(root, "ytbvos18"))),
        ]

    def _mots_dataset_specs(self, root):
        """(name, weight, builder) for the MOTS group (reference
        get_mot_dataset of the mask exp, unicorn_track_mask.py:203-229)."""
        import os

        from ..data.datasets.vos import COCOMOTSDataset, MOTSVideoDataset

        if self.mot_test_name == "bdd100k":
            from ..data.datasets.bdd import BDDOmniMOTSDataset

            return [("BDD-MOTS", 1, lambda: BDDOmniMOTSDataset(
                os.path.join(root, "bdd100k"), "train"))]
        if self.mot_test_name == "motchallenge":
            return [
                ("COCO-person", 1, lambda: COCOMOTSDataset(
                    self.data_dir or os.path.join(root, "coco"),
                    json_file=self.train_ann, name=self.train_name,
                    person_only=True)),
                ("MOTS-Challenge", 1, lambda: MOTSVideoDataset(
                    os.path.join(root, "MOTS"))),
            ]
        raise ValueError(f"Unsupported mot_test_name: {self.mot_test_name}")

    def get_data_loader(self, batch_size, is_distributed=False):
        from ..data.loader import UniMaskLoader
        from ..data.transforms import TrainTransformIns

        return UniMaskLoader(
            self.get_dataset(),
            TrainTransformIns(max_labels=self.max_labels,
                              flip_prob=self.flip_prob,
                              hsv_prob=self.hsv_prob, d_rate=self.d_rate),
            batch_size, self.input_size, alter_every=self.alter_step,
        )

    def get_train_step(self, batch_size):
        from ..core.train_step import make_uni_mask_train_step

        return make_uni_mask_train_step(
            self.get_model(), self.input_size,
            mot_weight=float(self.mot_weight) if self.scale_all_mot else 1.0,
            bidirect=self.bidirect, use_l1=self.always_l1,
            d_rate=self.d_rate,
            use_raft=self.use_raft, up_rate=self.up_rate,
            max_inst=int(getattr(self, "max_inst", 24)),
        )
