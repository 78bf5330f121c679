"""Multi-host / multi-slice initialization.

Replaces the reference's multi-node launch stack (tools/train_dist.py,
launch_uni.py --nnodes): on TPU pods each host runs the SAME single-controller
program; jax.distributed wires the hosts together and `jax.devices()` spans
the full pod. Data parallelism then rides ICI within a slice and DCN across
slices with no further code changes (SURVEY.md §2.11).
"""
from __future__ import annotations

import os

import numpy as np


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Call once at program start on every host. No-ops on a single host.

    On Cloud TPU pods the arguments auto-detect from the metadata server;
    elsewhere pass them (or set JAX_COORDINATOR_ADDRESS etc.).
    """
    import jax

    if num_processes in (None, 1) and coordinator_address is None \
            and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(dp_per_slice: int | None = None,
                  axis_names=("dcn", "data")):
    """2-level mesh for multi-slice training: outer axis over slices (DCN),
    inner axis over chips in a slice (ICI). Gradients psum hierarchically —
    XLA reduces over ICI first, then DCN."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_slices = max(1, len({getattr(d, "slice_index", 0) for d in devices}))
    per_slice = len(devices) // n_slices
    mesh_devices = np.asarray(devices).reshape(n_slices, per_slice)
    return Mesh(mesh_devices, axis_names)


def local_batch_slice(global_batch: int):
    """This host's share of the global batch (reference DistributedSampler
    role): contiguous shard by process index."""
    import jax

    per = global_batch // jax.process_count()
    start = per * jax.process_index()
    return start, per
