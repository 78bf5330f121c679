"""VOS+MOTS mask stage (reference unicorn_track_large_mask.py)"""
import os

from unicorn_tpu.exp.track_mask import ExpTrackMask


class Exp(ExpTrackMask):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.backbone_name = 'convnext_large'
        self.in_channels = [384, 768, 1536]
        self.pretrain_name = 'unicorn_track_large'
        self.remat = True  # convnext_large activations exceed HBM without it
