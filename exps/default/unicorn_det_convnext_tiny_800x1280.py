"""COCO detection pretraining, ConvNeXt-Tiny @ 800x1280 (reference exps/default/unicorn_det_convnext_tiny_800x1280.py)"""
import os

from unicorn_tpu.exp.det import ExpDet


class Exp(ExpDet):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.input_size = (800, 1280)
        self.test_size = (800, 1280)
