"""MOT-only ablation"""
import os

from unicorn_tpu.exp.track import ExpTrack


class Exp(ExpTrack):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.mot_only = True
