"""TPU-native ops: NMS, correlation, deformable attention, dynamic convs."""
from .nms import nms_fixed, postprocess_device
from .correlation import correlation_propagate, dice_loss
from .deform_attn import ms_deform_attn
from .dynamic_conv import dynamic_mask_logits, aligned_bilinear, convex_upsample
from .letterbox import letterbox_device

__all__ = ["nms_fixed", "postprocess_device", "correlation_propagate",
           "dice_loss", "ms_deform_attn", "dynamic_mask_logits",
           "aligned_bilinear", "convex_upsample", "letterbox_device"]
