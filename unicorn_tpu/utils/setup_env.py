"""Runtime environment setup.

Reference: unicorn/utils/setup_env.py (NCCL tuning, OMP threads, ulimit).
TPU-native equivalents: persistent XLA compile cache, host thread caps, and
deterministic seeding.
"""
from __future__ import annotations

import os
import random

import numpy as np


def configure_jax(cache_dir: str | None = None):
    """Enable the persistent compilation cache (big win when the backend
    compiles remotely) and sane defaults."""
    import jax

    if cache_dir is None:
        cache_dir = os.environ.get("JAX_CACHE_DIR",
                                   os.path.join(os.getcwd(), ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def configure_omp(num_threads: int | None = None):
    """Cap host BLAS/OMP threads (reference setup_env.py:30-49)."""
    if num_threads is None:
        num_threads = max(1, (os.cpu_count() or 1))
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, str(num_threads))


def seed_everything(seed: int):
    random.seed(seed)
    np.random.seed(seed % (2 ** 31))
