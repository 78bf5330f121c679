"""Count the reference pipeline's kernel-launching torch ops per frame.

Reproducible source for the dispatch-floor inputs in BASELINE.md: the
reference model + its OWN tracker classes (UnicornSOTTrack / UnicornVOSTrack,
imported unmodified on torch-cpu via tests/torch_ref.py) are driven for one
frame under torch.profiler, and we count LEAF aten ops (no cpu_children —
i.e. the primitives that would each be a CUDA kernel launch in the
reference's eager deployment), excluding view/metadata/alloc ops that
launch nothing.

Op counts are shape-independent for the MOT and SOT paths; the VOS path's
per-object python loop (unicorn_vos.py:157-203) multiplies head/mask work by
the number of live objects, so VOS is counted at K objects (--k, default 4).

Usage: python tools/ref_launch_count.py [--hw 96x160] [--k 4]
Prints one JSON line {"mot": n, "sot": n, "vos_k4": n, ...}.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np

# metadata / view / alloc ops: no CUDA kernel launch in eager torch
EXCLUDE = {
    "aten::view", "aten::reshape", "aten::_unsafe_view", "aten::alias",
    "aten::empty", "aten::empty_like", "aten::empty_strided",
    "aten::as_strided", "aten::slice", "aten::select", "aten::narrow",
    "aten::unsqueeze", "aten::squeeze", "aten::expand", "aten::expand_as",
    "aten::permute", "aten::transpose", "aten::t", "aten::detach",
    "aten::split", "aten::unbind", "aten::chunk", "aten::resolve_conj",
    "aten::resolve_neg", "aten::result_type", "aten::size", "aten::stride",
    "aten::item", "aten::_local_scalar_dense", "aten::is_nonzero",
    "aten::scalartensor", "aten::lift_fresh", "aten::to",
}


def count_leaf_ops(fn):
    import torch
    from torch.profiler import ProfilerActivity, profile

    with torch.no_grad():
        with profile(activities=[ProfilerActivity.CPU]) as prof:
            fn()
    n = 0
    for e in prof.events():
        if not e.name.startswith("aten::"):
            continue
        if e.cpu_children:          # composite wrapper, not a launch
            continue
        if e.name.lower() in EXCLUDE or e.name in EXCLUDE:
            continue
        n += 1
    return n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", default="96x160")
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--model", default="tiny", choices=["tiny", "large"],
                    help="large = convnext_large/[384,768,1536] "
                         "(unicorn_track_large); counts the MOT forward "
                         "only (SOT/VOS trackers are built at tiny)")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))

    import torch
    from torch_ref import (
        build_reference_tiny,
        load_reference,
        make_reference_sot_tracker,
        make_reference_vos_tracker,
    )

    load_reference()
    # the 'whole'-mode zeros in unicorn.py:136 hardcode device="cuda";
    # reuse the cpu-redirect shim torch_ref installs for the other modules
    import unicorn.models.deformable_transformer as _dt
    import unicorn.models.unicorn as _um

    _um.torch = _dt.torch

    rng = np.random.RandomState(0)
    frame = (rng.rand(70, 120, 3) * 255).astype(np.uint8)

    out = {"hw": f"{H}x{W}", "k": args.k}

    # ---- MOT: the 'whole'-mode forward the streaming bench baselines ----
    if args.model == "large":
        tm = build_reference_tiny(num_classes=8, seed=0,
                                  backbone_name="convnext_large",
                                  in_channels=(384, 768, 1536))
    else:
        tm = build_reference_tiny(num_classes=8, seed=0)
    tm.eval()
    x = torch.from_numpy(rng.rand(1, 3, H, W).astype(np.float32))

    def mot_fwd():
        tm(imgs=x, mode="whole")

    mot_fwd()  # warm (lazy inits out of the profile)
    out["mot"] = count_leaf_ops(mot_fwd)
    out["model"] = args.model
    if args.model == "large":
        # SOT/VOS tracker counts below are tiny-specific; MOT is what the
        # large A100 denominator needs (BASELINE.md large derivation)
        print(json.dumps(out))
        return

    # ---- SOT: one UnicornSOTTrack.track() frame (backbone + interaction +
    # correlation propagation + SOT head + postprocess) ----
    sot = make_reference_sot_tracker(tm, (H, W))
    sot.initialize(frame, {"init_bbox": [28.0, 18.0, 34.0, 27.0]})
    frame2 = (rng.rand(70, 120, 3) * 255).astype(np.uint8)
    sot.track(frame2)  # warm

    def sot_track():
        sot.track(frame2)

    out["sot"] = count_leaf_ops(sot_track)

    # ---- VOS: one UnicornVOSTrack.track() frame at K objects (the
    # reference loops objects: head+mask decode run K times) ----
    tmm = build_reference_tiny(num_classes=8, seed=0, with_mask=True)
    tmm.eval()
    vos = make_reference_vos_tracker(tmm, (H, W), max_inst=1)
    obj_ids = [str(k + 1) for k in range(args.k)]
    boxes = {}
    for k in range(args.k):
        y, x0 = 5 + 14 * k, 10 + 20 * k
        boxes[str(k + 1)] = [float(x0), float(y), 16.0, 12.0]
    vos.initialize(frame, {"init_object_ids": obj_ids,
                           "sequence_object_ids": obj_ids,
                           "init_bbox": boxes})
    vos.track(frame2, {})  # warm

    def vos_track():
        vos.track(frame2, {})

    out[f"vos_k{args.k}"] = count_leaf_ops(vos_track)

    # ---- VOS mixed-entry (multiref): K objects on K DIFFERENT entry
    # frames — the reference then pays one interaction + upsample +
    # transfer-matrix block PER ENTRY GROUP every frame (track() loops
    # self.out_dict_pre_new, unicorn_vos.py:80-101) on top of the
    # K-object head/mask loop. This is the denominator structure for
    # bench.py's vos_driver_fps_k4_multiref row. ----
    vos_m = make_reference_vos_tracker(tmm, (H, W), max_inst=1)
    vos_m.initialize(frame, {"init_object_ids": ["1"],
                             "sequence_object_ids": obj_ids,
                             "init_bbox": {"1": boxes["1"]}})
    blank_mask = np.zeros(frame.shape[:2], np.uint8)
    for k in range(1, args.k):
        # object k+1 enters on its own frame -> its own entry group
        vos_m.track(frame2, {"init_object_ids": [str(k + 1)],
                             "init_bbox": {str(k + 1): boxes[str(k + 1)]},
                             "init_mask": blank_mask})
    vos_m.track(frame2, {})  # warm the steady-state G=K graph

    def vos_track_multiref():
        vos_m.track(frame2, {})

    out[f"vos_k{args.k}_multiref"] = count_leaf_ops(vos_track_multiref)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
