"""Online trackers (reference unicorn/tracker)."""
from .byte_tracker import ByteTracker, TrackView
from .qd_tracker import QuasiDenseEmbedTracker
from .kalman import KalmanFilter

__all__ = ["ByteTracker", "TrackView", "QuasiDenseEmbedTracker", "KalmanFilter"]
