"""MOT-Challenge group: 1 class, no mhs (reference unicorn_track_large_mot_challenge.py)"""
import os

from unicorn_tpu.exp.track import ExpTrack


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.backbone_name = 'convnext_large'
        self.in_channels = [384, 768, 1536]
        self.pretrain_name = 'unicorn_det_convnext_large_800x1280'
        self.mot_test_name = 'motchallenge'
        self.num_classes = 1
        self.mhs = False
        self.remat = True  # convnext_large activations exceed HBM without it
