"""Sequence-parallel SOT/VOS serving: S independent sequences over a mesh.

The reference benchmarks SOT/VOS strictly one sequence per GPU process
(external/lib/test/evaluation/running.py runs sequences sequentially or via
multiprocessing, one tracker per process). The TPU-native form is the same
recipe as drivers/stream.MultiStreamMOT: stack S sequences' per-sequence
carry state (reference feature + label map) along a leading axis, vmap the
REAL per-frame driver fn over it, and shard that axis over an ICI-connected
"seq" mesh axis. Every chip serves its own sequences' full pipeline with
zero cross-chip traffic — throughput scales linearly with chips, and the
jitted program is byte-identical to the single-sequence one per slot
(asserted in tests/test_seq_parallel.py).

Used by __graft_entry__.dryrun_multichip (SOT + VOS under a mesh) and
bench.py's BENCH_MESH mode.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _make_seq_parallel_fn(frame_fn, mesh: Mesh, axis: str):
    """Shared scaffold: vmap a per-frame driver fn
    (params, ref_a, ref_b, frame (1, H, W, 3)) over a leading S axis and
    shard S over `axis` (params replicated). All three public variants are
    this one jit; keeping a single site means sharding/donation changes
    cannot drift between SOT and the two VOS forms."""
    rep = NamedSharding(mesh, P())
    sh = NamedSharding(mesh, P(axis))

    def multi(params, refs_a, refs_b, frames):
        return jax.vmap(
            lambda ra, rb, f: frame_fn(params, ra, rb, f[None])
        )(refs_a, refs_b, frames)

    return jax.jit(multi, in_shardings=(rep, sh, sh, sh), out_shardings=sh)


def make_sot_seq_parallel_fn(driver, mesh: Mesh, axis: str = "seq"):
    """Jitted multi-sequence SOT step over `mesh`.

    (params, feat_refs (S, 1, h16, w16, C), lbs_refs (S, 1, 1, N8),
     frames (S, H, W, 3) uint8) -> (S, max_inst, 8) packed dets,
    with S sharded over `axis`. Stack per-sequence `SOTDriver._init_fn`
    outputs along axis 0 to build feat_refs/lbs_refs.
    """
    return _make_seq_parallel_fn(driver._track_fn_raw, mesh, axis)


def make_vos_seq_parallel_fn(driver, mesh: Mesh, axis: str = "seq"):
    """Jitted multi-sequence VOS step over `mesh` (general per-slot-
    reference form: objects of one sequence may carry different entry
    frames).

    (params, feat_refs (S, K, h16, w16, C), lbs_refs (S, K, 1, N8),
     frames (S, H, W, 3) float) -> (dets (S, K, 8, 7), valid (S, K, 8),
    masks (S, K, H, W) when the model has a mask head), S sharded over
    `axis`. Each sequence carries its own K object slots.
    """
    return _make_seq_parallel_fn(driver._track_fn_raw, mesh, axis)


def make_vos_shared_seq_parallel_fn(driver, mesh: Mesh, axis: str = "seq"):
    """Shared-reference variant (all of a sequence's objects entered on the
    same frame — the DAVIS case): ONE interaction + ONE K-row correlation
    per sequence per frame (`VOSDriver.track_fn_shared`).

    (params, feat_ref1s (S, 1, h16, w16, C), lbs_refs (S, K, 1, N8),
     frames (S, H, W, 3) float) -> same outputs as
    make_vos_seq_parallel_fn, S sharded over `axis`.
    """
    return _make_seq_parallel_fn(driver._track_fn_shared_raw, mesh, axis)
