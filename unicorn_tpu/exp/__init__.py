"""Experiment system (reference unicorn/exp)."""
from .base import BaseExp, get_exp
from .det import ExpDet
from .det_mask import ExpDetMask
from .track import ExpTrack
from .track_mask import ExpTrackMask

__all__ = ["BaseExp", "get_exp", "ExpDet", "ExpDetMask", "ExpTrack",
           "ExpTrackMask"]
