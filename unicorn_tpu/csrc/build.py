"""Build the native shared library with g++.

The .so is NOT checked into git (binary provenance is unreviewable); it is
built on demand into the package dir and cached next to a source content hash
so stale binaries are never served after a source edit."""
from __future__ import annotations

import hashlib
import os
import subprocess

SRC_DIR = os.path.dirname(os.path.abspath(__file__))
LIB_PATH = os.path.join(SRC_DIR, "libunicorn_native.so")
HASH_PATH = LIB_PATH + ".srchash"
SOURCES = ["cocoeval.cpp", "rle.cpp", "pack.cpp"]


def _src_hash(srcs) -> str:
    h = hashlib.sha256()
    for s in srcs:
        h.update(open(s, "rb").read())
    return h.hexdigest()


def build(force: bool = False) -> str | None:
    srcs = [os.path.join(SRC_DIR, s) for s in SOURCES]
    want = _src_hash(srcs)
    if not force and os.path.exists(LIB_PATH) and os.path.exists(HASH_PATH) \
            and open(HASH_PATH).read().strip() == want:
        return LIB_PATH
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           "-o", LIB_PATH] + srcs
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        with open(HASH_PATH, "w") as f:
            f.write(want)
        return LIB_PATH
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        print(f"native build failed ({e}); falling back to pure python")
        return None


if __name__ == "__main__":
    out = build(force=True)
    print("built", out)
