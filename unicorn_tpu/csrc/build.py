"""Build the native shared library with g++."""
from __future__ import annotations

import os
import subprocess

SRC_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(SRC_DIR, "libunicorn_native.so")
SOURCES = ["cocoeval.cpp"]


def build(force: bool = False) -> str | None:
    srcs = [os.path.join(SRC_DIR, s) for s in SOURCES]
    if not force and os.path.exists(LIB_PATH) and all(
        os.path.getmtime(LIB_PATH) >= os.path.getmtime(s) for s in srcs
    ):
        return LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", LIB_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed ({e}); falling back to pure python")
        return None


if __name__ == "__main__":
    out = build(force=True)
    print("built", out)
