"""Spatial partitioning (SP): one frame sharded across chips for latency.

The reference serves exactly one stream per GPU — the whole frame and the
whole model run on one device (`unicorn/evaluators/mot_evaluator.py:100-245`),
so per-frame latency is pinned to single-chip throughput and NCCL offers no
way around it. On TPU the NHWC detection forward is a chain of convs, so
under pjit we can instead shard the *H axis of a single frame* over an
ICI-connected "sp" mesh axis: XLA's SPMD partitioner inserts the halo
exchanges each conv/pool window needs at shard edges, GroupNorm's per-sample
spatial reductions become psums, and only the tiny decoded candidate set is
gathered at the end. Per-chip conv work drops ~1/sp — this is the standard
TPU spatial-partitioning serving recipe for when ONE stream must go faster
than one chip allows, complementing the throughput-oriented "stream" axis
(drivers/stream.MultiStreamMOT, which keeps streams device-local).

Scope: the detection ("whole"-mode) forward + decode + NMS — the MOT serving
path. The SOT/VOS interaction stages gather globally (deformable attention,
16k-token correlation) and are better served by the replicated single-chip
drivers.

Correctness is asserted against the single-device forward on the virtual
8-device CPU mesh (tests/test_spatial.py); real-latency gains need real
multi-chip ICI, which this container does not have (BASELINE.md).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.heads import decode_for_inference
from ..models.unicorn import Unicorn
from ..ops.nms import postprocess_device


def spatial_sharding(mesh: Mesh, axis: str = "sp") -> NamedSharding:
    """(N, H, W, C) images sharded along H over the `axis` mesh axis.

    For even load balance H should be divisible by
    ``strides[-1] * mesh.shape[axis]`` (i.e. every shard holds the same
    number of rows at the deepest stride-32 map). GSPMD pads uneven shards
    silently — the result stays correct but the largest shard sets the
    step time. `spatial_detect_fn` warns at trace time when uneven."""
    return NamedSharding(mesh, P(None, axis, None, None))


def spatial_detect_fn(model: Unicorn, mesh: Mesh, axis: str = "sp",
                      num_classes: int = 1, strides=(8, 16, 32),
                      conf_thre: float = 0.1, nms_thre: float = 0.8,
                      n_cand: int = 128, max_out: int = 64):
    """Jitted spatially-partitioned detector: frames (N, H, W, 3) with H
    sharded over `axis` -> (dets (N, max_out, 7), valid (N, max_out)),
    replicated. Params replicate; XLA partitions the convs with halo
    exchange and all-gathers only the per-level decoded candidates.
    """
    rep = NamedSharding(mesh, P())
    img_sh = spatial_sharding(mesh, axis)
    n_sp = mesh.shape[axis]

    def detect(params, frames):
        # uneven shards are silently padded by GSPMD: still CORRECT, but
        # the largest shard sets the latency. Warn (don't fail — the
        # flagship 800-row input is not divisible by 32*4) so callers know
        # the load is unbalanced.
        if frames.shape[1] % (strides[-1] * n_sp) != 0:
            import warnings

            warnings.warn(
                f"spatial partitioning: H={frames.shape[1]} is not a "
                f"multiple of {strides[-1]}*{n_sp} (deepest stride x sp "
                f"shards); GSPMD pads the uneven shards — correct results, "
                f"unbalanced per-chip load", stacklevel=2)
        raw, _ = model.apply(params, frames, method=Unicorn.forward_whole)
        dec = decode_for_inference(raw, strides, mode="mot")
        # decoded anchors are tiny vs the feature maps: let the partitioner
        # gather them for the (global) top-k + NMS
        dec = jax.lax.with_sharding_constraint(dec, rep)
        return postprocess_device(
            dec, num_classes=num_classes, conf_thre=conf_thre,
            nms_thre=nms_thre, class_agnostic=(num_classes == 1),
            n_cand=n_cand, max_out=max_out)

    return jax.jit(detect, in_shardings=(rep, img_sh),
                   out_shardings=(rep, rep))
