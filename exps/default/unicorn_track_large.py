"""Unified SOT-MOT, ConvNeXt-Large @ 800x1280 (BDD group)"""
import os

from unicorn_tpu.exp.track import ExpTrack


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.backbone_name = 'convnext_large'
        self.in_channels = [384, 768, 1536]
        self.pretrain_name = 'unicorn_det_convnext_large_800x1280'
        self.remat = True  # convnext_large activations exceed HBM without it
        # (remat="dw" is faster when it fits — measured on tiny; unverified at
        # large-model HBM headroom, so the safe full-block remat stays default)
