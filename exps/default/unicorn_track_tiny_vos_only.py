"""VOS-only ablation"""
import os

from unicorn_tpu.exp.track_mask import ExpTrackMask


class Exp(ExpTrackMask):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.sot_only = True
        self.pretrain_name = 'unicorn_track_tiny'
