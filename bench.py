"""Benchmark: online tracking FPS per chip + per-stage device timing.

Primary metric (the BASELINE.json north star): full per-frame MOT17 pipeline
of the reference's ByteTrack path (SURVEY.md §3.2) as the TPU-native
streaming driver (unicorn_tpu/drivers/stream.py): frame -> backbone+head
(bf16, 'whole' mode) -> decode -> on-device NMS -> on-device ByteTrack
association, all fused in one jitted program with the tracker state resident
in HBM. Frames stream in chunks via lax.scan; only the packed (T, 7) track
outputs are fetched per chunk, so the (tunnel-latency-bound) host link is
amortized.

Extras (VERDICT r1 item 5):
  - sot_device_fps: the SOT/VOS hot path (interaction + upsample + 16k x 16k
    Pallas correlation at 100x160 + SOT head) timed on device
  - stage_ms: backbone / interaction+upsample+correlation / head+NMS+assoc
    breakdown, each timed by scanning the stage n times on device and
    fetching one scalar (a single fetch -> tunnel latency amortized; plain
    block_until_ready does not sync on this runtime). A NULL scan measures
    the residual per-application tunnel floor (fetch latency / n) which is
    subtracted from each stage — without this the round-2 numbers overstated
    every stage by ~4-6 ms/frame and understated SOT FPS ~2.5x.

Model: unicorn_track_tiny topology (ConvNeXt-Tiny + PAFPN + unified head),
input 800x1280.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
vs_baseline divides by the 84-FPS A100 reference-pipeline bound derived in
BASELINE.md ("A100 FPS baseline derivation") from measured FLOPs (518.8
GFLOP/frame), measured launch counts (509 ops), and public A100 specs.
"""
import json
import time
from functools import partial

import numpy as np

BASELINE_A100_FPS = 84.0  # BASELINE.md derivation (upper bound for the ref)


def _timed_scan(fn, carry, n, fetch):
    """Wall-time n scanned applications of fn via one final fetch (best of 2)."""
    out = fn(carry)
    _ = np.asarray(fetch(out))  # compile + lazy-exec warmup fetch
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = fn(carry)
        _ = np.asarray(fetch(out))
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0  # ms per application


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from unicorn_tpu.drivers.stream import StreamingMOTPipeline, pack_frames_np
    from unicorn_tpu.models.heads import decode_for_inference
    from unicorn_tpu.models.unicorn import Unicorn
    from unicorn_tpu.ops.nms import postprocess_device
    from unicorn_tpu.ops.pallas_correlation import correlation_propagate_auto
    from unicorn_tpu.tracker.jax_tracker import init_state, tracker_step

    import os

    # CI smoke override: BENCH_HW="64x96" BENCH_CHUNK=4 runs the same code
    # paths at toy sizes on CPU
    hw = os.environ.get("BENCH_HW", "800x1280").split("x")
    H, W = int(hw[0]), int(hw[1])
    # 64-frame chunks: each run_chunk call pays one tunnel dispatch + one
    # fetch (~30-50 ms each); at 32 frames/chunk that overhead was ~2 ms of
    # the 7.75 ms/frame. Device HBM holds 2 x 64 x 800x1280x3 fp32 = 1.6 GB.
    CHUNK = int(os.environ.get("BENCH_CHUNK", "64"))
    N_SCAN = int(os.environ.get("BENCH_NSCAN", "64"))
    model = Unicorn(
        num_classes=1, backbone_name="convnext_tiny", in_channels=(192, 384, 768),
        interact_mode="deform", n_layer_att=3, dtype=jnp.bfloat16,
        exact_gelu=False,  # tanh GELU for serving: ~2.8 ms/frame cheaper,
                           # output drift < 1e-2 in decoded scores (README)
    )
    # SOT/VOS serving model: interaction/upsample/correlation in bf16. The
    # reference itself serves the correlation in fp16 (unicorn_sot.py:94-97);
    # fp32 interaction is only a *training* requirement (autocast-off region).
    # Params are shared (param_dtype is fp32 in both).
    model_sot = model.clone(interact_dtype=jnp.bfloat16)
    rng = np.random.RandomState(0)
    frame0_np = rng.rand(1, H, W, 3).astype(np.float32) * 255.0
    frame0 = jnp.asarray(pack_frames_np(frame0_np))  # packed ingest format
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(frame0_np), method=Unicorn.init_all)

    # ---------------- primary: streaming MOT FPS ----------------
    # frame_batch: detector forward batched over F frames inside the scan
    # (association stays causal). Measured on one v5e at 800x1280: F=4 LOWERS
    # throughput (126 -> 87 FPS; batch-4 activations pressure HBM scheduling)
    # so the default stays 1; the knob exists for smaller inputs/chips.
    FB = int(os.environ.get("BENCH_FRAME_BATCH", "1"))
    # scoped-VMEM: the pipeline's "auto" default applies the measured
    # 48 MB sweet spot on TPU; BENCH_SCOPED_VMEM_KIB overrides (0 disables)
    vmem_kib = os.environ.get("BENCH_SCOPED_VMEM_KIB", "")
    copts = "auto" if vmem_kib == "" else (
        {"xla_tpu_scoped_vmem_limit_kib": vmem_kib}
        if jax.default_backend() == "tpu" and vmem_kib != "0" else None)
    pipe = StreamingMOTPipeline(
        model, params, input_size=(H, W), num_classes=1, conf_thre=0.1,
        nms_thre=0.8, max_dets=64, max_tracks=64, track_thresh=0.6,
        match_thresh=0.9, n_cand=128, frame_batch=min(FB, CHUNK),
        compiler_options=copts,
    )
    # frames are host-packed 4x4 space-to-depth (ingest format; exactly the
    # stem conv's patch decomposition — ~0.65 ms/frame cheaper than device
    # repacking of the (H, W, 3) layout)
    chunks = [
        jnp.asarray(pack_frames_np(
            rng.rand(CHUNK, H, W, 3).astype(np.float32) * 255.0))
        for _ in range(2)
    ]
    _ = np.asarray(pipe.run_chunk(chunks[0]))
    _ = np.asarray(pipe.run_chunk(chunks[1]))
    pipe.reset()

    n_chunks = 8
    depth = 2
    inflight = []
    t0 = time.perf_counter()
    for i in range(n_chunks):
        out = pipe.run_chunk(chunks[i % len(chunks)])
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        inflight.append(out)
        if len(inflight) >= depth:
            _ = np.asarray(inflight.pop(0))
    while inflight:
        _ = np.asarray(inflight.pop(0))
    dt = time.perf_counter() - t0
    fps = n_chunks * CHUNK / dt

    # ---------------- stage breakdown (device-true, scanned) ----------------
    h16, w16 = H // 16, W // 16
    h8, w8 = H // 8, W // 8
    eps = jnp.float32(1e-20)

    @jax.jit
    def scan_backbone(frame):
        def body(carry, _):
            fpn_outs, feat16 = model.apply(params, carry,
                                           method=Unicorn.forward_backbone)
            # fold a data-dependent epsilon back into the carry so XLA cannot
            # dead-code-eliminate the stage inside the timing scan
            carry = carry + jnp.mean(feat16).astype(carry.dtype) * eps
            return carry, ()
        carry, _ = jax.lax.scan(body, frame, None, length=N_SCAN)
        return jnp.mean(carry)

    lbs0 = jnp.zeros((1, 1, h8 * w8), jnp.float32).at[0, 0, :200].set(1.0)

    @jax.jit
    def scan_sot_core(feat16):
        """interaction + upsample x2 + 16k x 16k correlation-propagate (bf16
        serving path; the correlation kernel's dots are bf16 either way)."""
        def body(carry, _):
            f32 = carry.astype(jnp.float32)
            new0, new1 = model_sot.apply(params, f32, f32,
                                         method=Unicorn.forward_interaction)
            e0 = model_sot.apply(params, new0, method=Unicorn.forward_upsample)
            e1 = model_sot.apply(params, new1, method=Unicorn.forward_upsample)
            prior = correlation_propagate_auto(
                e0.reshape(1, h8 * w8, -1).astype(jnp.float32),
                e1.reshape(1, h8 * w8, -1).astype(jnp.float32), lbs0)
            carry = (carry.astype(jnp.float32)
                     + jnp.mean(prior) * eps).astype(carry.dtype)
            return carry, ()
        carry, _ = jax.lax.scan(body, feat16, None, length=N_SCAN)
        return jnp.mean(carry)

    def _head_once(fpn_outs, prior8, ts):
        priors = (
            prior8,
            jax.image.resize(prior8, (1, h16, w16, 1), "bilinear"),
            jax.image.resize(prior8, (1, h16 // 2, w16 // 2, 1), "bilinear"),
        )
        priors = tuple(p.astype(f.dtype) for p, f in zip(priors, fpn_outs))
        raw = model.apply(params, fpn_outs, priors, method=Unicorn.forward_head)
        dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
        dets, valid = postprocess_device(dec, num_classes=1, conf_thre=0.1,
                                         nms_thre=0.8, n_cand=128, max_out=64)
        d5 = jnp.concatenate(
            [dets[0, :, :4], (dets[0, :, 4] * dets[0, :, 5])[:, None]], -1)
        ts, out, ov = tracker_step(ts, d5, valid[0])
        return out, ts

    @jax.jit
    def scan_head(fpn_outs, prior8):
        ts0 = init_state(64)
        def body(carry, _):
            prior, ts = carry
            out, ts = _head_once(fpn_outs, prior, ts)
            prior = prior + jnp.mean(out).astype(prior.dtype) * eps
            return (prior, ts), ()
        (prior, ts), _ = jax.lax.scan(body, (prior8, ts0), None, length=N_SCAN)
        return jnp.mean(prior) + jnp.sum(ts.score)

    @jax.jit
    def scan_null(x):
        def body(c, _):
            return c * jnp.float32(1.0000001), ()
        c, _ = jax.lax.scan(body, x, None, length=N_SCAN)
        return jnp.mean(c)

    fpn_outs, feat16 = jax.jit(
        partial(model.apply, method=Unicorn.forward_backbone))(params, frame0)
    fpn_outs = jax.tree_util.tree_map(jax.block_until_ready, fpn_outs)
    prior8 = jnp.zeros((1, h8, w8, 1), jnp.float32)

    ms_floor = _timed_scan(scan_null, jnp.float32(1.0), N_SCAN, lambda o: o)
    ms_backbone = _timed_scan(scan_backbone, frame0, N_SCAN, lambda o: o) - ms_floor
    ms_sot_core = _timed_scan(scan_sot_core, feat16, N_SCAN, lambda o: o) - ms_floor
    ms_head = _timed_scan(lambda c: scan_head(fpn_outs, c), prior8, N_SCAN,
                          lambda o: o) - ms_floor

    sot_frame_ms = ms_backbone + ms_sot_core + ms_head
    extra = {
        "sot_device_fps": round(1000.0 / sot_frame_ms, 2),
        "stage_ms": {
            "backbone_fpn": round(ms_backbone, 3),
            "interaction_upsample_corr16k": round(ms_sot_core, 3),
            "head_nms_assoc": round(ms_head, 3),
            "tunnel_floor_per_app": round(ms_floor, 3),
        },
        "flops_per_frame_gflop": 518.8,
        "baseline_a100_fps": BASELINE_A100_FPS,
    }

    print(json.dumps({
        "metric": "mot17_online_fps_per_chip_800x1280",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_A100_FPS, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
