"""Unified SOT-MOT, ResNet-50 @ 800x1280"""
import os

from unicorn_tpu.exp.track import ExpTrack


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.backbone_name = 'resnet50'
        self.in_channels = [512, 1024, 2048]
        self.width = 0.5
        self.pretrain_name = 'unicorn_det_r50_800x1280'
