"""COCO detection pretraining, ConvNeXt-Large @ 800x1280"""
import os

from unicorn_tpu.exp.det import ExpDet


class Exp(ExpDet):
    def __init__(self):
        super().__init__()
        self.exp_name = os.path.split(os.path.realpath(__file__))[1].split(".")[0]
        self.backbone_name = 'convnext_large'
        self.in_channels = [384, 768, 1536]
        self.input_size = (800, 1280)
        self.test_size = (800, 1280)
        self.remat = True  # convnext_large activations exceed HBM without it
        # (remat="dw" is faster when it fits — measured on tiny; unverified at
        # large-model HBM headroom, so the safe full-block remat stays default)
