"""Test config: force CPU with 8 virtual devices so multi-chip sharding
tests run without TPU hardware (SURVEY.md §4 implication).

The container's sitecustomize registers the axon TPU PJRT plugin at
interpreter startup and pins JAX_PLATFORMS=axon, so plain env-var edits here
are too late — use jax.config instead (before any backend is initialized).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Persistent CPU compile cache: the 1-core box spends most of the suite
# compiling; cache entries survive across pytest runs (dir is gitignored).
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
