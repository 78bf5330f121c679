"""Native C++ components (ctypes bindings; no pybind11 in this image).

Build once: python -m unicorn_tpu.csrc.build  (or it auto-builds on first
import if g++ is available).
"""
