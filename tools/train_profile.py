"""Train-step stage profile + MFU (VERDICT r2 item 5 / weak 4).

Decomposes the unified (SOT+MOT) train step at the production shape
(800x1280, 2-frame batch) into device-timed stages, each measured with the
same scanned-subgraph technique bench.py uses (one fetch per N applications,
NULL-scan floor subtracted — jax.profiler cannot see device ops through the
axon tunnel, so subgraph timing is the only honest decomposition):

  fwd_embeddings   backbone x2 frames + interaction + upsample (grad OFF)
  fwd_loss         the whole loss forward (adds priors + head + SimOTA/losses)
  full_step        value_and_grad + optimizer apply (the real train step)
  optimizer        apply_gradients alone on captured grads

bwd is reported as full_step - fwd_loss - optimizer (the usual residual
decomposition). MFU uses XLA cost analysis FLOPs of the full step.

Env: TP_BATCH (default 1), TP_HW (default 800x1280), TP_NSCAN (default 8),
TP_REMAT=1 full block remat, TP_REMAT=dw selective (save dw7x7 output).
TP_MHS=1 times the production-default step (mhs auxiliary SOT pass on).
TP_MAP_BB=1 runs the backbone as lax.map over the 2B frames (batch-1 per
iteration — probes the measured batch>1 live-set regression, BASELINE.md
batch_stage). TP_GELU=tanh swaps the erf GELU for the tanh approximation
(quantifies the checkpoint-parity pin; serving already adopted tanh).
TP_ONLY=step times only the full train step (skips the stage scans and
their compiles — cheap A/B probes through the remote-compile queue).
Appends one JSON line to stdout.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, n, label):
    out = fn(*args)
    _ = np.asarray(out)
    best = 1e9
    for _i in range(2):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best / n * 1000.0


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("TP_CPU", "0") == "1":
        # CPU smoke for the harness itself (tiny TP_HW; the container pins
        # JAX_PLATFORMS=axon at startup, so env vars alone can't force CPU)
        jax.config.update("jax_platforms", "cpu")

    from unicorn_tpu.utils.setup_env import configure_jax
    configure_jax()

    from unicorn_tpu.core.train_state import (
        TrainState, default_wd_mask, make_optimizer,
    )
    from unicorn_tpu.core.train_step import (
        uni_forward_embeddings, uni_loss_fn,
    )
    from unicorn_tpu.models.unicorn import Unicorn

    hw = os.environ.get("TP_HW", "800x1280").split("x")
    H, W = int(hw[0]), int(hw[1])
    B = int(os.environ.get("TP_BATCH", "1"))
    N = int(os.environ.get("TP_NSCAN", "8"))
    remat_env = os.environ.get("TP_REMAT", "0")
    try:
        remat = {"0": False, "1": True, "dw": "dw"}[remat_env]
    except KeyError:
        sys.exit(f"TP_REMAT={remat_env!r}: valid values are 0, 1, dw")

    map_bb = os.environ.get("TP_MAP_BB", "0") == "1"
    # TP_MHS=1 times the PRODUCTION-default step (ExpTrack mhs=True: the
    # MOT-helps-SOT auxiliary pass with its second head call + sot_only
    # loss); the README/BASELINE per-stage tables time mhs=False.
    use_mhs = os.environ.get("TP_MHS", "0") == "1"
    gelu_env = os.environ.get("TP_GELU", "erf")
    if gelu_env not in ("erf", "tanh"):
        sys.exit(f"TP_GELU={gelu_env!r}: valid values are erf, tanh")

    model = Unicorn(num_classes=8, backbone_name="convnext_tiny",
                    in_channels=(192, 384, 768), interact_mode="deform",
                    n_layer_att=3, dtype=jnp.bfloat16, remat=remat,
                    exact_gelu=(gelu_env == "erf"))
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255)
    M = 60
    tg = np.zeros((B, 2, M, 6), np.float32)
    for b in range(B):
        for f in range(2):
            for k in range(10):
                cx, cy = rng.uniform(100, W - 100), rng.uniform(100, H - 100)
                tg[b, f, k] = [0, cx, cy, rng.uniform(40, 160),
                               rng.uniform(40, 160), k + 1]
    targets = jnp.asarray(tg)
    task_ids = jnp.asarray([1, 2] * (B // 2) + [1] * (B % 2), jnp.int32)

    params = model.init(jax.random.PRNGKey(0), images[:1, 0],
                        method=Unicorn.init_all)
    tx = make_optimizer(lambda s: 1e-4, kind="adamw",
                        no_decay_mask_fn=default_wd_mask)
    state = TrainState.create(params, tx)

    # NOTE: params/images/targets are jit ARGUMENTS everywhere — closed-over
    # device arrays become HLO constants that the tunnel ships inside every
    # compile request (B=4 images alone are 98 MB; the request hit the
    # HTTP 413 cap — same fix as bench.py).
    def scan_wrap(fn, n):
        """n applications with the IMAGES as the scan carry, each iteration
        perturbed by eps*output — the body must consume the carry or XLA
        hoists the loop-invariant computation out of the scan and the
        per-application time collapses to 1/n of truth (observed at B=4:
        'fwd 11 ms' vs the real ~88)."""
        eps = jnp.float32(1e-20)

        @jax.jit
        def run(images0, *args):
            def body(c, _):
                out = fn(c, *args)
                return c + (out * eps).astype(c.dtype), ()
            c, _ = jax.lax.scan(body, images0, None, length=n)
            return jnp.mean(c.astype(jnp.float32))
        return run

    def loss(p, images, targets, task_ids):
        return uni_loss_fn(model, p, images, targets, task_ids, (H, W),
                           bidirect=True, num_classes=8, backbone_map=map_bb,
                           mhs=use_mhs)

    fwd_emb = scan_wrap(
        lambda im, p: jnp.mean(uni_forward_embeddings(
            model, p, im, backbone_map=map_bb)[1]).astype(jnp.float32), N)
    fwd_loss = scan_wrap(
        lambda im, p, tg, tid: loss(p, im, tg, tid)[0], N)

    grad_fn = jax.value_and_grad(
        lambda p, im, tg, tid: loss(p, im, tg, tid)[0])

    @jax.jit
    def full_step(state, im, tg, tid):
        l, grads = grad_fn(state.params, im, tg, tid)
        return state.apply_gradients(grads), l

    step_only = os.environ.get("TP_ONLY", "") == "step"

    if not step_only:
        @jax.jit
        def grads_only(state, im, tg, tid):
            return grad_fn(state.params, im, tg, tid)[1]

        grads = grads_only(state, images, targets, task_ids)
        grads = jax.block_until_ready(grads)

        @jax.jit
        def opt_only(state, grads):
            return state.apply_gradients(grads).step

    emb_split = os.environ.get("TP_EMB_SPLIT", "0") == "1"
    t_bb = t_inter = t_ups = None
    if emb_split:
        # decompose the embedding stage (VERDICT r4 item 2: "why does the
        # training forward run ~24 TFLOP/s where the same graph serves at
        # 76?"): backbone x2-frame batch vs fp32 interaction vs fp32
        # upsample, each as its own carry-threaded scan. The fp32 stages
        # are the reference's own autocast-off region (unicorn.py:491-504)
        # - parity-pinned; this MEASURES what that parity costs.
        from unicorn_tpu.models.unicorn import Unicorn as _U

        def bb_only(im, p):
            Bq, nF, Hq, Wq, _ = im.shape
            flat = im.transpose(1, 0, 2, 3, 4).reshape(2 * Bq, Hq, Wq, 3)
            if map_bb:
                feat16 = jax.lax.map(
                    lambda x: model.apply(p, x[None],
                                          method=_U.forward_backbone)[1][0],
                    flat)
            else:
                _, feat16 = model.apply(p, flat, method=_U.forward_backbone)
            return jnp.mean(feat16).astype(jnp.float32)

        feat16_shape = (2 * B, H // 16, W // 16, model.in_channels[1])
        feat16_x = jnp.asarray(
            rng.rand(*feat16_shape).astype(np.float32)).astype(model.dtype)

        def inter_only(f16, p):
            Bq = f16.shape[0] // 2
            f0 = f16[:Bq].astype(jnp.float32)
            f1 = f16[Bq:].astype(jnp.float32)
            new0, new1 = model.apply(p, f0, f1,
                                     method=_U.forward_interaction)
            return (jnp.mean(new0) + jnp.mean(new1)).astype(jnp.float32)

        def inter_ups(f16, p):
            Bq = f16.shape[0] // 2
            f0 = f16[:Bq].astype(jnp.float32)
            f1 = f16[Bq:].astype(jnp.float32)
            new0, new1 = model.apply(p, f0, f1,
                                     method=_U.forward_interaction)
            e0 = model.apply(p, new0, method=_U.forward_upsample)
            e1 = model.apply(p, new1, method=_U.forward_upsample)
            return (jnp.mean(e0) + jnp.mean(e1)).astype(jnp.float32)

        def scan_feat(fn, n):
            eps_ = jnp.float32(1e-20)

            @jax.jit
            def run(x0, p):
                def body(c, _):
                    out = fn(c, p)
                    return c + (out * eps_).astype(c.dtype), ()
                c, _ = jax.lax.scan(body, x0, None, length=n)
                return jnp.mean(c.astype(jnp.float32))
            return run

        bb_scan = scan_wrap(bb_only, N)
        inter_scan = scan_feat(inter_only, N)
        ups_scan = scan_feat(inter_ups, N)

    bwd_split = os.environ.get("TP_BWD_SPLIT", "0") == "1"
    t_emb_grad = None
    if bwd_split:
        # bwd decomposition: value_and_grad of the EMBEDDING stage alone
        # (backbone x2 + interaction + upsample) — its bwd time separates
        # trunk/interaction gradients from head/loss gradients in the full
        # step's bwd residual
        emb_grad_fn = jax.jit(jax.grad(
            lambda p, im: jnp.sum(
                uni_forward_embeddings(model, p, im, backbone_map=map_bb)[1]
                .astype(jnp.float32))))

        def emb_grad_once(p, im):
            return jax.tree_util.tree_leaves(emb_grad_fn(p, im))[0]

    @jax.jit
    def null(c0):
        def body(c, _):
            return c * jnp.float32(1.0000001), ()
        c, _ = jax.lax.scan(body, c0, None, length=N)
        return c

    c0 = jnp.float32(1.0)
    floor = timed(null, (c0,), N, "null")

    @jax.jit
    def null1(x):
        return x * jnp.float32(1.0000001)

    # single-application fetch floor: full_step/opt are timed once per call,
    # so each measurement carries one tunnel round-trip — subtract it
    floor1 = timed(null1, (c0,), 1, "null1")
    t_emb = t_fwd = None
    if not step_only:
        t_emb = timed(fwd_emb, (images, state.params), N, "fwd_emb") - floor
        t_fwd = timed(fwd_loss, (images, state.params, targets, task_ids),
                      N, "fwd_loss") - floor
    if emb_split:
        t_bb = timed(bb_scan, (images, state.params), N, "bb_only") - floor
        t_iu = timed(ups_scan, (feat16_x, state.params), N,
                     "inter_ups") - floor
        t_inter = timed(inter_scan, (feat16_x, state.params), N,
                        "inter_only") - floor
        t_ups = t_iu - t_inter

    def step_once(s, im, tg, tid):
        s2, l = full_step(s, im, tg, tid)
        return l
    t_step = timed(step_once, (state, images, targets, task_ids), 1,
                   "full_step") - floor1
    t_opt = None
    if not step_only:
        t_opt = max(timed(lambda s: opt_only(s, grads), (state,), 1, "opt")
                    - floor1, 0.0)
    if bwd_split:
        t_emb_grad = timed(emb_grad_once, (state.params, images), 1,
                           "emb_grad") - floor1

    def lowered_flops(fn, *args):
        """Pre-optimization HLO flops (same accounting as the serving
        518.8 GFLOP figure); the compiled cost_analysis under-reports."""
        try:
            ca = jax.jit(fn).lower(*args).cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return None

    flops = lowered_flops(step_once, state, images, targets, task_ids)
    # per-stage flops for the training MFU table (BASELINE.md): HLO cost
    # analysis counts a scan body ONCE (verified: scan-of-8 ≈ 1.03x single),
    # so the scanned timers' lowerings already report one application;
    # bwd = step - fwd - opt
    f_emb = f_fwd = f_opt = None
    if not step_only:
        f_emb = lowered_flops(lambda im, p: fwd_emb(im, p),
                              images, state.params)
        f_fwd = lowered_flops(lambda im, p, tg, tid: fwd_loss(im, p, tg, tid),
                              images, state.params, targets, task_ids)
        f_opt = lowered_flops(lambda s: opt_only(s, grads), state)
    stage_tflop = {}
    if f_emb and f_fwd and flops:
        stage_tflop = {
            "fwd_embeddings": round(f_emb / 1e12, 3),
            "fwd_loss_total": round(f_fwd / 1e12, 3),
            "priors_head_simota": round((f_fwd - f_emb) / 1e12, 3),
            "optimizer": round((f_opt or 0.0) / 1e12, 3),
            "bwd_residual": round(
                (flops - f_fwd - (f_opt or 0.0)) / 1e12, 3),
            "full_step": round(flops / 1e12, 3),
        }
    mfu = None
    if flops:
        mfu = round(flops / (t_step / 1e3) / 197e12, 4)  # v5e bf16 peak

    print(json.dumps({
        "metric": "uni_train_step_profile",
        "batch": B, "hw": f"{H}x{W}", "remat": remat,
        "map_bb": map_bb, "gelu": gelu_env, "mhs": use_mhs,
        "stage_ms": {
            "full_step": round(t_step, 1),
            **({"fwd_embeddings": round(t_emb, 1),
                "fwd_loss_total": round(t_fwd, 1),
                "priors_head_simota": round(t_fwd - t_emb, 1),
                "optimizer": round(t_opt, 1),
                "bwd_residual": round(t_step - t_fwd - t_opt, 1)}
               if not step_only else {}),
            **({"emb_fwd_plus_bwd": round(t_emb_grad, 1),
                **({"emb_bwd_est": round(t_emb_grad - t_emb, 1)}
                   if t_emb is not None else {})}
               if t_emb_grad is not None else {}),
            **({"backbone_x2": round(t_bb, 1),
                "interaction_fp32": round(t_inter, 1),
                "upsample_fp32": round(t_ups, 1)}
               if t_bb is not None else {}),
        },
        "fetch_floor_ms": round(floor1, 1),
        "ms_per_sample": round(t_step / B, 1),
        "step_tflop": round(flops / 1e12, 2) if flops else None,
        "stage_tflop": stage_tflop or None,
        "mfu_vs_197tflops": mfu,
    }))


if __name__ == "__main__":
    main()
