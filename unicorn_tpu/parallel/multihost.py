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


def _multihost_env() -> bool:
    """True when the environment indicates a MULTI-host launch: an explicit
    JAX coordinator, a multi-slice (megascale) coordinator, or Cloud TPU pod
    metadata listing more than one worker. Single-host TPU VMs also set
    TPU_WORKER_HOSTNAMES (with one entry), so the count matters."""
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        return True
    if "MEGASCALE_COORDINATOR_ADDRESS" in os.environ:
        return True
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None):
    """Call once at program start on every host. No-ops on a single host.

    On Cloud TPU pods the arguments auto-detect from the metadata server
    (bare `jax.distributed.initialize()`), which is reached whenever a pod
    env marker is present — a bare call on a true single host would fail
    auto-detection, so the guard checks the markers rather than requiring
    callers to thread coordinates through."""
    import jax

    if num_processes in (None, 1) and coordinator_address is None \
            and not _multihost_env():
        return  # single-host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_pod_mesh(axis_names=("dcn", "data")):
    """2-level mesh for multi-slice training: outer axis over slices (DCN),
    inner axis over chips in a slice (ICI). Gradients psum hierarchically —
    XLA reduces over ICI first, then DCN."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n_slices = max(1, len({getattr(d, "slice_index", 0) for d in devices}))
    per_slice = len(devices) // n_slices
    # Sort so each mesh row holds ONE slice's chips: jax.devices() order is
    # not guaranteed slice-grouped, and a mixed row would put the inner
    # "data" axis (meant to ride ICI) across DCN links.
    devices = sorted(devices,
                     key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id))
    mesh_devices = np.asarray(devices).reshape(n_slices, per_slice)
    return Mesh(mesh_devices, axis_names)


def local_batch_slice(global_batch: int):
    """This host's share of the global batch (reference DistributedSampler
    role): contiguous shard by process index."""
    import jax

    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global_batch={global_batch} must divide evenly over "
            f"{n} processes — a silent floor would drop samples every step")
    per = global_batch // n
    start = per * jax.process_index()
    return start, per
