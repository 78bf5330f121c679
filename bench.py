"""Benchmark: online MOT tracking FPS per chip (the BASELINE.json north star).

Measures the full per-frame MOT17 pipeline of the reference's ByteTrack path
(SURVEY.md §3.2) as the TPU-native streaming driver
(unicorn_tpu/drivers/stream.py): frame -> backbone+head (bf16, 'whole' mode)
-> decode -> on-device NMS -> on-device ByteTrack association, all fused in
one jitted program with the tracker state resident in HBM. Frames stream in
chunks via lax.scan; only the packed (T, 7) track outputs are fetched per
chunk, so the (tunnel-latency-bound) host link is amortized.

Model: unicorn_track_tiny topology (ConvNeXt-Tiny + PAFPN + unified head,
deformable interaction present but idle on the MOT17 path, exactly like the
reference), input 800x1280.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference publishes no FPS (BASELINE.md); the paper
(arXiv:2207.07078) targets ~30 FPS real-time on GPU. BASELINE.json's goal is
>=2x A100 FPS, so vs_baseline = measured_fps / 60.0.
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from unicorn_tpu.drivers.stream import StreamingMOTPipeline
    from unicorn_tpu.models.unicorn import Unicorn

    H, W = 800, 1280
    CHUNK = 32
    model = Unicorn(
        num_classes=1, backbone_name="convnext_tiny", in_channels=(192, 384, 768),
        interact_mode="deform", n_layer_att=3, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    frame0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255.0)
    params = model.init(jax.random.PRNGKey(0), frame0, method=Unicorn.init_all)

    pipe = StreamingMOTPipeline(
        model, params, input_size=(H, W), num_classes=1, conf_thre=0.1,
        nms_thre=0.8, max_dets=64, max_tracks=64, track_thresh=0.6,
        match_thresh=0.9, n_cand=128,
    )

    chunks = [
        jnp.asarray(rng.rand(CHUNK, H, W, 3).astype(np.float32) * 255.0)
        for _ in range(2)
    ]

    # warmup: compile + force real execution and first host fetch (the first
    # fetch pays a one-time runtime warmup on this link)
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

    print(json.dumps({
        "metric": "mot17_online_fps_per_chip_800x1280",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
