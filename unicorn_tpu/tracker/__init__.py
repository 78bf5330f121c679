"""Online trackers (reference unicorn/tracker)."""
from .byte_tracker import ByteTracker, STrack
from .qd_tracker import QuasiDenseEmbedTracker
from .kalman import KalmanFilter

__all__ = ["ByteTracker", "STrack", "QuasiDenseEmbedTracker", "KalmanFilter"]
