"""Benchmark: online MOT tracking FPS per chip (the BASELINE.json north star).

Measures the per-frame MOT17 pipeline of the reference's ByteTrack path
(SURVEY.md §3.2): frame -> backbone+head ('whole' mode, bf16) -> decode ->
ON-DEVICE confidence filter + class NMS + top-K -> tiny (K,7) device->host
transfer -> ByteTrack association, streaming frames on a single chip at
800x1280 (unicorn_track_tiny config size).

TPU-native design points exercised here:
  * all postprocessing stays on device (ops/nms.py) — only ~3.5 KB crosses
    the host link per frame (the tunnel link is latency-bound);
  * the loop keeps 2 frames in flight (double buffering) so dispatch and
    host association overlap device compute.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no FPS figures (BASELINE.md); the
paper (arXiv:2207.07078) targets real-time ~30 FPS on GPU. BASELINE.json's
goal is >=2x A100 FPS, so vs_baseline = measured_fps / 60.0.
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

    from unicorn_tpu.models.heads import decode_for_inference
    from unicorn_tpu.models.unicorn import Unicorn
    from unicorn_tpu.ops.nms import postprocess_device
    from unicorn_tpu.tracker.byte_tracker import ByteTracker

    H, W = 800, 1280
    model = Unicorn(
        num_classes=1, backbone_name="convnext_tiny", in_channels=(192, 384, 768),
        interact_mode="deform", n_layer_att=3, dtype=jnp.bfloat16,
    )
    rng = np.random.RandomState(0)
    frames = [jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255.0)
              for _ in range(4)]
    params = model.init(jax.random.PRNGKey(0), frames[0], method=Unicorn.init_all)

    @jax.jit
    def step(params, frame):
        raw, _ = model.apply(params, frame, method=Unicorn.forward_whole)
        dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
        dets, valid = postprocess_device(
            dec, num_classes=1, conf_thre=0.1, nms_thre=0.8,
            class_agnostic=True, n_cand=512, max_out=128,
        )
        # pack dets + validity into ONE tensor -> single D2H per frame
        return jnp.concatenate(
            [dets[0], valid[0][:, None].astype(dets.dtype)], axis=1)

    tracker = ByteTracker(track_thresh=0.6, track_buffer=30, match_thresh=0.9)

    # warmup: compile AND force real execution + first host fetch (the first
    # fetch pays a large one-time runtime warmup on this link)
    _ = np.asarray(step(params, frames[0]))
    _ = np.asarray(step(params, frames[1]))

    def associate(packed_np):
        d = packed_np[packed_np[:, 7] > 0.5]
        if len(d):
            tracker.update(d[:, :4], d[:, 4] * d[:, 5], d[:, 6])

    n_frames = 100
    depth = 3  # frames in flight; D2H copies start async per frame
    inflight = []
    t0 = time.perf_counter()
    for i in range(n_frames):
        out = step(params, frames[i % len(frames)])
        try:
            out.copy_to_host_async()
        except Exception:
            pass
        inflight.append(out)
        if len(inflight) >= depth:
            associate(np.asarray(inflight.pop(0)))
    while inflight:
        associate(np.asarray(inflight.pop(0)))
    dt = time.perf_counter() - t0
    fps = n_frames / dt

    print(json.dumps({
        "metric": "mot17_online_fps_per_chip_800x1280",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
