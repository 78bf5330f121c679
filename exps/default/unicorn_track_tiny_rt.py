"""Real-time setting: 640x1024 input (reference unicorn_track_tiny_rt.py)"""
import os

from unicorn_tpu.exp.track import ExpTrack


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.input_size = (640, 1024)
        self.test_size = (640, 1024)
        self.pretrain_name = 'unicorn_det_convnext_tiny_800x1280'
