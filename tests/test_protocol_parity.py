"""Golden inference-PROTOCOL parity vs the reference tracker classes.

test_torch_parity.py proves per-layer numerics; these tests prove the
*frame-loop logic*: the reference's own `UnicornSOTTrack` / `UnicornVOSTrack`
classes (external/lib/test/tracker/unicorn_{sot,vos}.py, imported unmodified
on torch-cpu via torch_ref.load_reference_trackers) drive the reference model
over a synthetic clip, and our SOTDriver / VOSDriver must produce the same
per-frame boxes / indexed masks on the converted weights — including the
candidate cap (max_inst), coordinate clamp + rescale + int truncation, state
carry on empty frames, VOS per-object reference dicts, mid-video object
entry, and soft mask aggregation.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

try:
    from torch_ref import (
        build_reference_tiny,
        make_reference_sot_tracker,
        make_reference_vos_tracker,
    )
except ImportError:
    from tests.torch_ref import (
        build_reference_tiny,
        make_reference_sot_tracker,
        make_reference_vos_tracker,
    )

import jax
import jax.numpy as jnp

from tools.convert_torch_weights import convert_state_dict, insert_into_tree
from unicorn_tpu.models.unicorn import Unicorn

H, W = 96, 160          # letterbox input size (divisible by 32)
IMG_H, IMG_W = 70, 120  # "original video" size -> non-trivial resize r


def _convert(tm, jm, example):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = jm.init(jax.random.PRNGKey(0), jnp.asarray(example),
                     method=Unicorn.init_all)
    mapped, missed = convert_state_dict(sd, depth=1.0)
    assert not missed, f"unmapped torch keys: {missed[:10]}"
    params["params"], _, mism = insert_into_tree(params["params"], mapped)
    assert not mism, f"placement issues: {mism[:10]}"
    return params


def _clip(n_frames, seed=0):
    """Synthetic RGB clip with a moving bright blob (content is irrelevant to
    random-weight outputs, but deterministic frames keep both sides in sync)."""
    rng = np.random.RandomState(seed)
    frames = []
    for t in range(n_frames):
        img = (rng.rand(IMG_H, IMG_W, 3) * 255).astype(np.uint8)
        x, y = 30 + 6 * t, 20 + 3 * t
        img[y:y + 24, x:x + 30] = [240, 200, 60]
        frames.append(img)
    return frames


@pytest.fixture(scope="module")
def sot_pair():
    try:
        tm = build_reference_tiny(num_classes=8, seed=0)
    except ImportError as e:
        pytest.skip(f"reference tree unavailable: {e}")
    jm = Unicorn(num_classes=8, backbone_name="convnext_tiny",
                 in_channels=(192, 384, 768), interact_mode="deform",
                 n_layer_att=3)
    rng = np.random.RandomState(0)
    example = (rng.rand(1, H, W, 3) * 255).astype(np.float32)
    params = _convert(tm, jm, example)
    return tm, jm, params


def test_sot_frame_loop_parity(sot_pair):
    """unicorn_sot.py:39-77 initialize/track protocol: per-frame target_bbox
    must match the reference class frame by frame (reference truncates the
    xywh state to int, unicorn_sot.py:74, so tolerance is 1px + fp drift)."""
    from unicorn_tpu.drivers.sot import SOTDriver

    tm, jm, params = sot_pair
    frames = _clip(4)
    init_bbox = [28.0, 18.0, 34.0, 27.0]  # xywh in original coords

    ref = make_reference_sot_tracker(tm, (H, W))
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})

    drv = SOTDriver(jm, params, input_size=(H, W), conf_thre=0.001,
                    nms_thre=0.65, max_inst=3)
    # reference frames arrive RGB and PreprocessorX BGR-swaps them
    # (unicorn_sot.py:121); our driver ingests BGR directly
    drv.initialize(frames[0][:, :, ::-1], init_bbox)

    for i, frame in enumerate(frames[1:], 1):
        ref_box = ref.track(frame)["target_bbox"]
        our_box = drv.track(frame[:, :, ::-1])["target_bbox"]
        np.testing.assert_allclose(
            our_box, ref_box, atol=1.01,
            err_msg=f"frame {i}: ref={ref_box} ours={our_box}")


def test_sot_track_window_matches_sequential(sot_pair):
    """track_window (batched TPU serving path) == sequential track == the
    reference protocol: SOT per-frame compute depends only on frame-0 state."""
    from unicorn_tpu.drivers.sot import SOTDriver

    tm, jm, params = sot_pair
    frames = _clip(4, seed=3)
    init_bbox = [25.0, 15.0, 30.0, 24.0]

    ref = make_reference_sot_tracker(tm, (H, W))
    ref.initialize(frames[0], {"init_bbox": list(init_bbox)})
    ref_boxes = [ref.track(f)["target_bbox"] for f in frames[1:]]

    drv = SOTDriver(jm, params, input_size=(H, W), conf_thre=0.001,
                    nms_thre=0.65, max_inst=3)
    drv.initialize(frames[0][:, :, ::-1], init_bbox)
    outs = drv.track_window([f[:, :, ::-1] for f in frames[1:]], window=3)
    for i, (o, r) in enumerate(zip(outs, ref_boxes)):
        np.testing.assert_allclose(o["target_bbox"], r, atol=1.01,
                                   err_msg=f"frame {i+1}")
