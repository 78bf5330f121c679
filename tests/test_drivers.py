"""End-to-end driver tests (tiny model, CPU): SOT tracking and VOS mask
propagation through the public driver APIs."""
import jax
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.drivers.sot import SOTDriver
from unicorn_tpu.drivers.vos import VOSDriver
from unicorn_tpu.models.unicorn import Unicorn

H = W = 64


def _model_params(use_mask=False):
    model = Unicorn(num_classes=1, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False,
                    use_mask=use_mask)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), frame, method=Unicorn.init_all)
    return model, params


def test_sot_driver_tracks():
    model, params = _model_params()
    driver = SOTDriver(model, params, input_size=(H, W), conf_thre=0.0)
    rng = np.random.RandomState(0)
    img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    driver.initialize(img, [10, 10, 20, 20])
    for _ in range(3):
        out = driver.track((rng.rand(48, 56, 3) * 255).astype(np.uint8))
    box = out["target_bbox"]
    assert len(box) == 4
    assert all(np.isfinite(box))
    assert box[2] > 0 and box[3] > 0


def test_vos_driver_masks():
    model, params = _model_params(use_mask=True)
    driver = VOSDriver(model, params, input_size=(H, W), max_objects=3,
                       conf_thre=0.0)
    rng = np.random.RandomState(1)
    img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    mask = np.zeros((48, 56), np.uint8)
    mask[5:20, 5:20] = 1
    mask[25:40, 30:50] = 2
    driver.initialize(img, mask)
    assert driver.obj_ids == [1, 2]
    out_mask, boxes = driver.track((rng.rand(48, 56, 3) * 255).astype(np.uint8))
    assert out_mask is not None
    assert out_mask.shape == mask.shape
    assert set(np.unique(out_mask)) <= {0, 1, 2}


def test_vos_driver_mid_video_object_entry():
    """Object 3 enters at frame 2 (YouTube-VOS case, reference
    unicorn_vos.py:86-101): add_objects gives it a slot whose reference is
    the entry frame, and subsequent tracking emits all three ids."""
    model, params = _model_params(use_mask=True)
    driver = VOSDriver(model, params, input_size=(H, W), max_objects=3,
                       conf_thre=0.0)
    rng = np.random.RandomState(5)
    imgs = [(rng.rand(48, 56, 3) * 255).astype(np.uint8) for _ in range(5)]
    mask0 = np.zeros((48, 56), np.uint8)
    mask0[5:20, 5:20] = 1
    mask0[25:40, 30:50] = 2
    driver.initialize(imgs[0], mask0)
    out1, _ = driver.track(imgs[1])
    assert set(np.unique(out1)) <= {0, 1, 2}

    mask2 = np.zeros((48, 56), np.uint8)
    mask2[30:44, 2:18] = 7  # new object with a non-contiguous id
    driver.add_objects(imgs[2], mask2)
    assert driver.obj_ids == [1, 2, 7]
    assert driver.obj_valid.sum() == 3
    # re-adding known ids is a no-op
    driver.add_objects(imgs[2], mask2)
    assert driver.obj_ids == [1, 2, 7]

    out3, boxes = driver.track(imgs[3])
    assert out3 is not None
    assert set(np.unique(out3)) <= {0, 1, 2, 7}


def test_vos_driver_two_objects_enter_same_frame():
    """Two objects entering on ONE frame must get DISTINCT slots with their
    own label priors (regression: both got slot len(obj_ids), the second
    overwrote the first's prior and one id pointed at a never-set slot),
    and slot overflow raises loudly instead of silently dropping objects."""
    import pytest

    model, params = _model_params(use_mask=True)
    driver = VOSDriver(model, params, input_size=(H, W), max_objects=4,
                       conf_thre=0.0)
    rng = np.random.RandomState(9)
    img0 = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    mask0 = np.zeros((48, 56), np.uint8)
    mask0[5:20, 5:20] = 1
    driver.initialize(img0, mask0)

    mask2 = np.zeros((48, 56), np.uint8)
    mask2[2:14, 30:54] = 5
    mask2[30:44, 2:18] = 6
    driver.add_objects((rng.rand(48, 56, 3) * 255).astype(np.uint8), mask2)
    assert driver.obj_ids == [1, 5, 6]
    assert driver.obj_valid[:3].sum() == 3
    lb5 = np.asarray(driver.lbs_ref[1])
    lb6 = np.asarray(driver.lbs_ref[2])
    assert lb5.sum() > 0 and lb6.sum() > 0
    assert not np.allclose(lb5, lb6)

    # overflow: a 5th object with all 4 slots taken must raise
    mask3 = np.zeros((48, 56), np.uint8)
    mask3[10:20, 40:50] = 8
    mask3[30:40, 40:50] = 9
    with pytest.raises(ValueError, match="slots"):
        driver.add_objects((rng.rand(48, 56, 3) * 255).astype(np.uint8),
                           mask3)
    # init-time overflow raises too
    d2 = VOSDriver(model, params, input_size=(H, W), max_objects=1,
                   conf_thre=0.0)
    with pytest.raises(ValueError, match="max_objects"):
        d2.initialize(img0, mask2)


def test_sot_track_window_matches_sequential():
    model, params = _model_params()
    rng = np.random.RandomState(2)
    imgs = [(rng.rand(48, 56, 3) * 255).astype(np.uint8) for _ in range(5)]
    init = [10, 10, 20, 20]

    d1 = SOTDriver(model, params, input_size=(H, W), conf_thre=0.0)
    d1.initialize(imgs[0], init)
    seq = [d1.track(im)["target_bbox"] for im in imgs[1:]]

    d2 = SOTDriver(model, params, input_size=(H, W), conf_thre=0.0)
    d2.initialize(imgs[0], init)
    win = [o["target_bbox"] for o in d2.track_window(imgs[1:], window=3)]
    np.testing.assert_allclose(np.asarray(seq), np.asarray(win), rtol=1e-4,
                               atol=1e-3)


def test_mot_omni_driver():
    from unicorn_tpu.drivers.mot import MOTOmniDriver

    model, params = _model_params()
    driver = MOTOmniDriver(model, params, input_size=(H, W), num_classes=1,
                           conf_thre=0.0,
                           qd_params=dict(init_score_thr=0.0,
                                          obj_score_thr=0.0,
                                          match_score_thr=0.01))
    rng = np.random.RandomState(3)
    for t in range(3):
        img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
        bboxes, labels, ids = driver.update(img)
        assert len(bboxes) == len(ids) == len(labels)
        if len(ids):
            assert (ids >= 0).all()
    # reset clears tracker + temporal state
    driver.reset()
    assert driver.frame_id == 0 and driver.feat_prev is None


def test_mot_driver_bytetrack():
    from unicorn_tpu.drivers.mot import MOTDriver

    model, params = _model_params()
    driver = MOTDriver(model, params, input_size=(H, W), conf_thre=0.0,
                       track_thresh=0.01)
    rng = np.random.RandomState(4)
    for t in range(3):
        img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
        online = driver.update(img)
    assert isinstance(online, list)


def test_vos_shared_ref_path_matches_general():
    """The shared-reference fast path (one interaction + one K-row
    correlation, matching the reference's per-entry-group get_det_results,
    unicorn_vos.py:159-186) must produce the same dets/masks as the general
    per-slot path when every slot shares the entry frame."""
    model, params = _model_params(use_mask=True)
    driver = VOSDriver(model, params, input_size=(H, W), max_objects=3,
                       conf_thre=0.0)
    rng = np.random.RandomState(2)
    img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    mask = np.zeros((48, 56), np.uint8)
    mask[5:20, 5:20] = 1
    mask[25:40, 30:50] = 2
    driver.initialize(img, mask)
    assert driver.shared_ref
    frame, _ = driver._preproc((rng.rand(48, 56, 3) * 255).astype(np.uint8))

    d_sh, v_sh, m_sh = jax.tree_util.tree_map(np.asarray, driver._track_fn_shared(
        params, driver.feat_ref1, driver.lbs_ref, frame))
    d_g, v_g, m_g = jax.tree_util.tree_map(np.asarray, driver._track_fn(
        params, driver.feat_ref, driver.lbs_ref, frame))
    np.testing.assert_array_equal(v_sh, v_g)
    np.testing.assert_allclose(d_sh, d_g, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(m_sh, m_g, rtol=2e-4, atol=2e-3)

    # the lax.map-interaction multiref variant (perf A/B form) must match
    # the K-batched general path too — same contractions at B=1
    d_m, v_m, m_m = jax.tree_util.tree_map(
        np.asarray, jax.jit(driver._track_fn_mapped_raw)(
            params, driver.feat_ref, driver.lbs_ref, frame))
    np.testing.assert_array_equal(v_m, v_g)
    np.testing.assert_allclose(d_m, d_g, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(m_m, m_g, rtol=2e-4, atol=2e-3)

    # mid-video entry flips the driver off the fast path
    img3 = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
    mask3 = np.zeros((48, 56), np.uint8)
    mask3[10:22, 40:54] = 3
    driver.add_objects(img3, mask3)
    assert not driver.shared_ref
    out_mask, _ = driver.track((rng.rand(48, 56, 3) * 255).astype(np.uint8))
    assert out_mask is not None


def test_mot_omni_driver_deepsort():
    """MOTOmniDriver(tracker="deepsort"): the legacy DeepSORT association on
    the same fused detection+embedding step (evaluate_deepsort role)."""
    from unicorn_tpu.drivers.mot import MOTOmniDriver
    from unicorn_tpu.tracker.legacy import DeepSort

    model, params = _model_params()
    driver = MOTOmniDriver(model, params, input_size=(H, W), num_classes=1,
                           conf_thre=0.0, tracker="deepsort")
    assert isinstance(driver.tracker, DeepSort)
    rng = np.random.RandomState(5)
    imgs = [(rng.rand(48, 56, 3) * 255).astype(np.uint8) for _ in range(4)]
    seen_ids = []
    for img in imgs:
        bboxes, labels, ids = driver.update(img)
        assert len(bboxes) == len(ids) == len(labels)
        assert bboxes.shape[1:] == (5,)
        seen_ids.append(ids.tolist())
    # random-init scores are uniform-ish; DeepSORT confirms after n_init=3
    # consecutive matches, so by frame 4 ids may exist — either way the
    # shapes/lifecycle must hold and reset must rebuild a DeepSort
    driver.reset()
    assert isinstance(driver.tracker, DeepSort)
    assert driver.frame_id == 0 and driver.feat_prev is None


def test_mot_omni_driver_with_mask_alignment():
    """with_mask=True: update returns per-track CondInst mask probs
    row-aligned with the tracker output (return_index contract). Masks must
    be finite probabilities on the stride-4 grid."""
    from unicorn_tpu.drivers.mot import MOTOmniDriver

    model, params = _model_params(use_mask=True)
    driver = MOTOmniDriver(model, params, input_size=(H, W), num_classes=1,
                           conf_thre=0.0, with_mask=True,
                           qd_params=dict(init_score_thr=0.0,
                                          obj_score_thr=0.0,
                                          match_score_thr=0.01))
    rng = np.random.RandomState(7)
    for t in range(3):
        img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
        bboxes, labels, ids, masks = driver.update(img)
        assert len(masks) == len(bboxes) == len(ids)
        if len(masks):
            assert masks.shape[1:] == (H // 4, W // 4)
            assert np.isfinite(masks).all()
            assert masks.min() >= 0.0 and masks.max() <= 1.0


def test_mot_omni_driver_deepsort_with_mask():
    """DeepSORT mask path (last_det_indices contract): every returned view
    gets a mask row; coasting tracks get the zero mask."""
    from unicorn_tpu.drivers.mot import MOTOmniDriver

    model, params = _model_params(use_mask=True)
    driver = MOTOmniDriver(model, params, input_size=(H, W), num_classes=1,
                           conf_thre=0.0, with_mask=True, tracker="deepsort")
    rng = np.random.RandomState(8)
    for t in range(4):
        img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
        bboxes, labels, ids, masks = driver.update(img)
        assert len(masks) == len(bboxes)
        if len(masks):
            assert masks.shape[1:] == (H // 4, W // 4)
    # frames where NO detection passes validity must keep the documented
    # mask grid shape (regression: empty frames returned (n, 1, 1))
    driver2 = MOTOmniDriver(model, params, input_size=(H, W), num_classes=1,
                            conf_thre=1.0, with_mask=True,
                            tracker="deepsort")
    for t in range(2):
        img = (rng.rand(48, 56, 3) * 255).astype(np.uint8)
        _bboxes, _labels, _ids, masks = driver2.update(img)
        assert masks.shape[1:] == (H // 4, W // 4), masks.shape
