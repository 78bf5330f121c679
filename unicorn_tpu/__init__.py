"""unicorn_tpu — a TPU-native (JAX/XLA/Pallas/pjit) unified object-tracking framework.

One network, one set of weights, six tasks: object detection, instance
segmentation, SOT, MOT, VOS, and MOTS — re-architected TPU-first from the
capabilities of the Unicorn reference (ECCV 2022, /root/reference).

Layout conventions (TPU-native, differs deliberately from the reference):
  * images and feature maps are NHWC (XLA's preferred TPU conv layout)
  * all shapes are static: instances padded to `max_labels` with validity masks
  * the model is a set of pure jitted stage functions (backbone / interaction /
    embed / head / loss) instead of the reference's mode-dispatched nn.Module
    (reference: unicorn/models/unicorn.py:60)
  * normalization is GroupNorm (per-sample -> no cross-replica sync under pjit)
"""

__version__ = "0.1.0"
