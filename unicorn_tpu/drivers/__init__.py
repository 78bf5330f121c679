"""Streaming inference drivers (SOT / MOT / VOS / multi-stream serving)."""
from .sot import SOTDriver
from .mot import MOTDriver, MOTOmniDriver
from .vos import VOSDriver
from .stream import MultiStreamMOT, StreamingMOTPipeline

__all__ = ["SOTDriver", "MOTDriver", "MOTOmniDriver", "VOSDriver",
           "MultiStreamMOT", "StreamingMOTPipeline"]
