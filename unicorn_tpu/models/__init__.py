"""Models (reference unicorn/models)."""
from .unicorn import Unicorn, YOLOXDet
from .pafpn import YOLOPAFPN
from .heads import UnicornHead, decode_for_inference
from .mask_head import MaskBranch

__all__ = ["Unicorn", "YOLOXDet", "YOLOPAFPN", "UnicornHead",
           "decode_for_inference", "MaskBranch"]
