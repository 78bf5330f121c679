"""COCO instance-seg stage (CondInst branch only), ConvNeXt-Tiny @ 800x1280"""
import os

from unicorn_tpu.exp.det_mask import ExpDetMask


class Exp(ExpDetMask):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.input_size = (800, 1280)
        self.test_size = (800, 1280)
