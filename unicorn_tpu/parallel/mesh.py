"""Device-mesh and sharding utilities — the TPU-native replacement for the
reference's NCCL/DDP launch stack (unicorn/core/launch.py, utils/dist.py).

Single-controller JAX: no process spawning, no process groups. A 1-D "data"
mesh axis gives DDP-equivalent data parallelism (XLA emits the grad psum over
ICI); a "stream" axis shards independent video streams for serving
(SURVEY.md §2.11).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Build a mesh over all available devices (default: 1-D data mesh)."""
    devices = np.asarray(jax.devices())
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    assert int(np.prod(axis_sizes)) == len(devices), (
        f"mesh {axis_sizes} != {len(devices)} devices"
    )
    return Mesh(devices.reshape(axis_sizes), axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a host batch with the leading dim sharded over `axis`.

    Multi-host: each process passes its LOCAL slice of the global batch
    (see multihost.local_batch_slice) and the global array is assembled
    without any cross-host copy (reference DistributedSampler + DDP role)."""
    sh = data_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
            batch)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate_state(mesh: Mesh, state):
    """Replicate train state (params/opt/ema) across the mesh (pure DP)."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "shape") else x, state
    )
