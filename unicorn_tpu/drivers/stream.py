"""Fully on-device streaming MOT pipeline + multi-stream serving.

The BASELINE.json north-star driver: video frames stream through
backbone -> head -> decode -> NMS -> ByteTrack association with the tracker
state resident in HBM as a jax carry. Nothing crosses the host link per frame;
track outputs are fetched in periodic batches (or per-chunk via lax.scan).

Multi-stream serving shards independent videos across chips over a "stream"
mesh axis (SURVEY.md §2.11: the reference's inference distribution is
embarrassingly parallel over sequences; here it is one pjit program).
"""
from __future__ import annotations

import numpy as np

from ..models.heads import decode_for_inference
from ..models.unicorn import Unicorn
from ..ops.nms import postprocess_device
from ..tracker.jax_tracker import init_state, tracker_step


def pack_frames_np(frames: np.ndarray) -> np.ndarray:
    """Host-side 4x4 space-to-depth: (N, H, W, 3) -> (N, H/4, W/4, 48).

    The packed form is the preferred device ingest format for ConvNeXt-stem
    models: the stem consumes it as one dense matmul (~0.05 ms/frame at
    800x1280) whereas repacking the (H, W, 3) layout ON DEVICE costs
    ~0.7 ms/frame (tiny-minor-dim relayout) no matter how it is phrased.
    Patch-major (dy, dx, c) order matches models.convnext.space_to_depth_4x4.
    """
    n, h, w, c = frames.shape
    if h % 4 or w % 4:
        raise ValueError(f"pack_frames_np needs H, W divisible by 4 "
                         f"(letterboxed input), got {h}x{w}")
    if frames.dtype == np.uint8:  # ndim==4 guaranteed by the unpack above
        # native row-streaming packer (csrc/pack.cpp): ~2.0 vs 3.4 ms/frame
        # numpy transpose-copy at 800x1280 on one core; bit-identical
        try:
            from ..csrc.bindings import pack_frames_s2d4

            out = pack_frames_s2d4(frames)
            if out is not None:
                return out
        except Exception:
            pass
    xp = frames.reshape(n, h // 4, 4, w // 4, 4, c)
    return np.ascontiguousarray(xp.transpose(0, 1, 3, 2, 4, 5)).reshape(
        n, h // 4, w // 4, 16 * c)


class StreamingMOTPipeline:
    def __init__(self, model: Unicorn, params, input_size=(800, 1280),
                 num_classes: int = 1, conf_thre: float = 0.1,
                 nms_thre: float = 0.8, max_dets: int = 64,
                 max_tracks: int = 128, track_thresh: float = 0.6,
                 match_thresh: float = 0.9, chunk: int = 8,
                 n_cand: int = 128, frame_batch: int = 1,
                 track_buffer: int = 30,
                 compiler_options="auto", approx_topk: bool = True,
                 n_streams: int = 1, pipelined: bool = False,
                 unroll: int = 1):
        """frame_batch F > 1 batches the (frame-independent) detector forward
        over F consecutive frames inside the chunk scan while the tracker
        still consumes frames causally one by one. MEASURED on one v5e at
        800x1280 (round 3): batch > 1 REGRESSES ~35%/frame (F=2: 109.6 FPS
        with or without scoped-vmem, S=2 streams: 103.4, vs 146.9 at
        F=S=1) — keep F=1 on v5e at this shape; the knobs exist for smaller
        inputs/chips. chunk length must divide by F.

        Frames may be fed either raw (N, H, W, 3) or host-packed
        (N, H/4, W/4, 48) via `pack_frames_np` (ConvNeXt-stem models only);
        the stem consumes both, the packed form ~0.65 ms/frame faster."""
        import jax
        import jax.numpy as jnp

        self.input_size = tuple(input_size)
        self.params = params
        self.max_tracks = max_tracks
        self.chunk = chunk
        self._jnp = jnp

        def detect(params, frames):
            """frames (F, H, W, 3) -> (dets5 (F, D, 5), valid (F, D))."""
            raw, _ = model.apply(params, frames, method=Unicorn.forward_whole)
            dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
            dets, valid = postprocess_device(
                dec, num_classes=num_classes, conf_thre=conf_thre,
                nms_thre=nms_thre, class_agnostic=(num_classes == 1),
                n_cand=n_cand, max_out=max_dets, cluster_iters=8,
                approx_topk=approx_topk,  # True for serving throughput
                # (recall_target 0.99); eval tools pass False for exact top-k
            )
            dets5 = jnp.concatenate(
                [dets[..., :4], (dets[..., 4] * dets[..., 5])[..., None]],
                axis=-1)
            return dets5, valid

        def assoc(ts, dets5, valid):
            ts, out, out_valid = tracker_step(
                ts, dets5, valid, track_thresh=track_thresh,
                match_thresh=match_thresh, max_time_lost=track_buffer)
            packed = jnp.concatenate(
                [out, out_valid[:, None].astype(out.dtype)], axis=1)
            return ts, packed

        def frame_step(params, ts, frame):
            dets5, valid = detect(params, frame)
            return assoc(ts, dets5[0], valid[0])

        F = int(frame_batch)
        UNROLL = int(unroll)

        def chunk_step(params, ts, frames):
            """frames (N, H, W, 3): scan N frames in one XLA program,
            detecting F frames per scan iteration."""
            N, H, W, C = frames.shape
            assert N % F == 0, f"chunk {N} not divisible by frame_batch {F}"
            frames = frames.reshape(N // F, F, H, W, C)

            def body(ts, fbatch):
                dets5, valid = detect(params, fbatch)
                packs = []
                for f in range(F):  # causal association, one frame at a time
                    ts, packed = assoc(ts, dets5[f], valid[f])
                    packs.append(packed)
                return ts, jnp.stack(packs)

            ts, outs = jax.lax.scan(body, ts, frames, unroll=UNROLL)
            return ts, outs.reshape(N, *outs.shape[2:])  # (N, T, 7)

        def chunk_step_pipelined(params, ts, frames):
            """Software-pipelined scan: iteration i runs detect(frame_i)
            and assoc(dets_{i-1}) as two INDEPENDENT subgraphs, letting the
            scheduler overlap the (VPU/gather-heavy) NMS+association of the
            previous frame with the (MXU-heavy) backbone of the current one.
            Association stays strictly causal — results are identical to
            chunk_step (tests/test_stream.py), outputs just flush one
            iteration later."""
            N = frames.shape[0]
            # postprocess_device clamps its output rows to min(max_out,
            # n_cand); the pipelined carry must match detect()'s REAL output
            # shape or lax.scan rejects the carry structure when
            # max_dets > n_cand
            D = min(max_dets, n_cand)

            def body(carry, inp):
                i, frame = inp
                ts, pdets, pvalid = carry
                ts2, packed = assoc(ts, pdets, pvalid)
                # iteration 0 has no previous dets: keep ts untouched (an
                # empty assoc would still age tracks / bump frame_id)
                keep = i > 0
                ts2 = jax.tree_util.tree_map(
                    lambda b, a: jnp.where(keep, b, a), ts2, ts)
                dets5, valid = detect(params, frame[None])
                return (ts2, dets5[0], valid[0]), packed

            zero = (ts, jnp.zeros((D, 5), jnp.float32),
                    jnp.zeros((D,), bool))
            (ts, ldets, lvalid), outs = jax.lax.scan(
                body, zero, (jnp.arange(N), frames), unroll=UNROLL)
            ts, last = assoc(ts, ldets, lvalid)  # flush the final frame
            return ts, jnp.concatenate([outs[1:], last[None]], axis=0)

        def chunk_step_multi(params, ts_v, frames):
            """S independent streams batched through ONE chip: frames
            (S, N, H, W, C), ts_v a vmapped tracker state (leading dim S).
            Per scan step the detector runs at batch S (better MXU
            utilization than S sequential frames) and the S per-stream
            associations run as one vmapped tracker_step — causality holds
            per stream because streams never mix. Returns (S, N, T, 7)."""
            S, N = frames.shape[0], frames.shape[1]
            frames = jnp.swapaxes(frames, 0, 1)  # scan over time

            def body(ts_v, fbatch):
                dets5, valid = detect(params, fbatch)  # (S, D, 5), (S, D)
                ts_v, packed = jax.vmap(assoc)(ts_v, dets5, valid)
                return ts_v, packed

            ts_v, outs = jax.lax.scan(body, ts_v, frames)
            return ts_v, jnp.swapaxes(outs, 0, 1)

        self.n_streams = int(n_streams)
        if self.n_streams > 1 and (pipelined or F != 1):
            # chunk_step_multi ignores both knobs; accepting them would
            # silently bench the plain multi-stream path
            raise ValueError(
                "n_streams > 1 supports neither pipelined=True nor "
                "frame_batch > 1 (the multi-stream chunk step already "
                "batches the detector across streams)")
        self._frame_step_raw = frame_step
        self._frame_step = jax.jit(frame_step)
        self._chunk_step = jax.jit(
            chunk_step_multi if self.n_streams > 1
            else (chunk_step_pipelined if pipelined else chunk_step))
        # XLA compiler options for the chunk program. "auto" applies the
        # measured sweet spot on TPU (scoped VMEM 48 MB: +1.7% FPS on v5e at
        # 800x1280; 40-48 MB wins, >=56 MB regresses — program-specific, do
        # NOT apply to other jits). XLA_FLAGS cannot carry TPU flags through
        # the axon tunnel (the local CPU XLA rejects them at startup), so
        # they go through lower().compile() here, cached per input shape.
        if compiler_options == "auto":
            compiler_options = (
                {"xla_tpu_scoped_vmem_limit_kib": "49152"}
                if jax.default_backend() == "tpu" else None)
        self._copts = compiler_options
        self._compiled_chunk = {}
        self.reset()

    def reset(self):
        if self.n_streams > 1:
            import jax

            self.ts = jax.vmap(lambda _: init_state(self.max_tracks))(
                self._jnp.arange(self.n_streams))
        else:
            self.ts = init_state(self.max_tracks)

    def push_frame(self, frame_device):
        """One frame (1, H, W, 3) already on device. Returns the device-held
        packed output (T, 7) [x1,y1,x2,y2,score,id,valid] WITHOUT fetching."""
        self.ts, packed = self._frame_step(self.params, self.ts, frame_device)
        return packed

    def run_chunk(self, frames_device):
        """frames (N, H, W, C) on device -> (N, T, 7) device output; with
        n_streams=S > 1, frames (S, N, H, W, C) -> (S, N, T, 7)."""
        if self._copts:
            key = (tuple(frames_device.shape), str(frames_device.dtype))
            if key not in self._compiled_chunk:
                self._compiled_chunk[key] = self._chunk_step.lower(
                    self.params, self.ts, frames_device
                ).compile(compiler_options=self._copts)
            self.ts, outs = self._compiled_chunk[key](
                self.params, self.ts, frames_device)
            return outs
        self.ts, outs = self._chunk_step(self.params, self.ts, frames_device)
        return outs


class MultiStreamMOT:
    """S independent streams, one tracker state each, sharded over a mesh.

    frames (S, H, W, 3) arrive per tick; states and frames shard along
    "stream". XLA runs every stream's full pipeline in parallel over ICI-
    connected chips with zero cross-chip traffic (states never mix).
    """

    def __init__(self, model: Unicorn, params, n_streams: int, mesh=None,
                 axis: str = "stream", **kw):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        pipe = StreamingMOTPipeline(model, params, **kw)
        self.n_streams = n_streams
        self._jnp = jnp

        def tick(params, states, frames):
            def one(ts, frame):
                return pipe._frame_step_raw(params, ts, frame[None])

            return jax.vmap(one)(states, frames)

        self.params = params
        self.mesh = mesh
        max_tracks = kw.get("max_tracks", 128)
        state_tree = init_state(max_tracks)
        if mesh is not None:
            state_sh = NamedSharding(mesh, P(axis))
            state_shardings = jax.tree_util.tree_map(
                lambda _: state_sh, state_tree)
            self._tick = jax.jit(
                tick,
                in_shardings=(NamedSharding(mesh, P()), state_shardings,
                              state_sh),
                out_shardings=(state_shardings, state_sh),
            )
        else:
            self._tick = jax.jit(tick)
        self.states = jax.vmap(lambda _: init_state(max_tracks))(
            jnp.arange(n_streams))

    def tick(self, frames_device):
        """frames (S, H, W, 3) -> (S, T, 7) packed outputs (device)."""
        self.states, outs = self._tick(self.params, self.states, frames_device)
        return outs
