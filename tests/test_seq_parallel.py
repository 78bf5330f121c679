"""Sequence-parallel SOT/VOS serving (drivers/seq_parallel.py): S sequences
sharded over a "seq" mesh must produce the SAME per-sequence outputs as the
single-device driver fn run sequence by sequence."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from unicorn_tpu.drivers.seq_parallel import (
    make_sot_seq_parallel_fn,
    make_vos_seq_parallel_fn,
)
from unicorn_tpu.drivers.sot import SOTDriver
from unicorn_tpu.drivers.vos import VOSDriver
from unicorn_tpu.models.unicorn import Unicorn

H, W = 64, 64
S = 4


def _model(use_mask=False):
    return Unicorn(num_classes=1, backbone_name="csp_darknet", depth=0.33,
                   width=0.25, in_channels=(256, 512, 1024),
                   interact_mode="conv", n_layer_att=0, use_attention=False,
                   use_mask=use_mask)


def test_sot_seq_parallel_matches_sequential():
    model = _model()
    rng = np.random.RandomState(0)
    frame0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), frame0,
                        method=Unicorn.init_all)
    drv = SOTDriver(model, params, input_size=(H, W), conf_thre=0.001,
                    max_inst=3)

    feat_refs, lbs_refs, frames = [], [], []
    for s in range(S):
        f0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
        box = jnp.asarray(
            np.array([[20.0 + 4 * s, 24.0 + 3 * s, 16.0, 12.0]], np.float32))
        fr, lr = drv._init_fn(params, f0, box)
        feat_refs.append(fr)
        lbs_refs.append(lr)
        frames.append((rng.rand(H, W, 3) * 255).astype(np.uint8))
    feat_refs = jnp.stack(feat_refs)
    lbs_refs = jnp.stack(lbs_refs)
    frames = jnp.asarray(np.stack(frames))

    mesh = Mesh(np.asarray(jax.devices()[:S]), ("seq",))
    fn = make_sot_seq_parallel_fn(drv, mesh)
    packed_sp = np.asarray(fn(params, feat_refs, lbs_refs, frames))
    assert packed_sp.shape == (S, 3, 8)

    for s in range(S):
        ref = np.asarray(drv._track_fn(params, feat_refs[s], lbs_refs[s],
                                       frames[s][None]))
        np.testing.assert_allclose(packed_sp[s], ref, rtol=2e-4, atol=2e-3)


def test_vos_seq_parallel_matches_sequential():
    model = _model(use_mask=True)
    rng = np.random.RandomState(1)
    frame0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), frame0,
                        method=Unicorn.init_all)
    K = 2
    drv = VOSDriver(model, params, input_size=(H, W), max_objects=K,
                    conf_thre=0.001)

    feat_refs, lbs_refs, frames = [], [], []
    for s in range(S):
        f0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
        masks = np.zeros((K, H, W), np.float32)
        masks[0, 8 + s:28 + s, 10:30] = 1.0
        masks[1, 36:56, 30 - s:50 - s] = 1.0
        fr1, lr = drv._init_fn(params, f0, jnp.asarray(masks))
        feat_refs.append(jnp.broadcast_to(fr1, (K,) + fr1.shape[1:]))
        lbs_refs.append(lr)
        frames.append(rng.rand(H, W, 3).astype(np.float32) * 255)
    feat_refs = jnp.stack(feat_refs)
    lbs_refs = jnp.stack(lbs_refs)
    frames = jnp.asarray(np.stack(frames))

    mesh = Mesh(np.asarray(jax.devices()[:S]), ("seq",))
    fn = make_vos_seq_parallel_fn(drv, mesh)
    dets_sp, valid_sp, masks_sp = jax.tree_util.tree_map(
        np.asarray, fn(params, feat_refs, lbs_refs, frames))
    assert dets_sp.shape[:2] == (S, K)
    assert masks_sp.shape == (S, K, H, W)

    for s in (0, S - 1):
        dets, valid, masks = jax.tree_util.tree_map(
            np.asarray,
            drv._track_fn(params, feat_refs[s], lbs_refs[s], frames[s][None]))
        np.testing.assert_allclose(dets_sp[s], dets, rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(masks_sp[s], masks, rtol=2e-4, atol=2e-3)


def test_run_dataset_sot_parallel_matches_sequential(tmp_path):
    """The lockstep multi-sequence runner (harness/running.py) must emit the
    SAME per-sequence box files as the sequential runner — including slot
    retirement and refill with unequal sequence lengths."""
    import cv2

    from unicorn_tpu.harness.datasets import Sequence
    from unicorn_tpu.harness.running import (
        run_dataset_sot, run_dataset_sot_parallel,
    )

    model = _model()
    rng = np.random.RandomState(3)
    frame0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), frame0,
                        method=Unicorn.init_all)

    # different lengths over 2 slots -> forces a refill; the 1-frame
    # sequence exercises the finish-at-load path
    seqs = []
    for si, n_frames in enumerate((3, 5, 4, 1)):
        paths = []
        for t in range(n_frames):
            img = (rng.rand(52, 60, 3) * 255).astype(np.uint8)
            x, y = 8 + 3 * t + 2 * si, 6 + 2 * t
            img[y:y + 14, x:x + 16] = [240, 200, 60]
            p = str(tmp_path / f"s{si}_f{t}.jpg")
            cv2.imwrite(p, img)
            paths.append(p)
        seqs.append(Sequence(name=f"seq{si}", frames=paths,
                             ground_truth_rect=np.array(
                                 [[8.0 + 2 * si, 6.0, 16.0, 14.0]])))

    def factory():
        return SOTDriver(model, params, input_size=(H, W), conf_thre=0.0,
                         max_inst=3)

    res_seq = run_dataset_sot(factory, seqs, verbose=False)

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("seq",))
    drv = factory()
    res_par = run_dataset_sot_parallel(drv, seqs, mesh, verbose=False)

    assert set(res_par) == set(res_seq) == {"seq0", "seq1", "seq2", "seq3"}
    for name in res_seq:
        np.testing.assert_allclose(res_par[name], res_seq[name], atol=1e-2)


def test_run_dataset_vos_parallel_matches_sequential(tmp_path):
    """The lockstep multi-sequence VOS runner must emit the same indexed
    masks as sequential run_sequence_vos, and fall back to sequential for
    sequences with mid-video annotated entries."""
    import cv2

    from unicorn_tpu.harness.datasets import Sequence
    from unicorn_tpu.harness.running import (
        run_dataset_vos_parallel, run_sequence_vos,
    )

    model = _model(use_mask=True)
    rng = np.random.RandomState(4)
    frame0 = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), frame0,
                        method=Unicorn.init_all)

    def write_seq(si, n_frames, mid_entry=False, davis_gt=False):
        fdir = tmp_path / f"s{si}"
        fdir.mkdir()
        frames, masks = [], []
        for t in range(n_frames):
            img = (rng.rand(52, 60, 3) * 255).astype(np.uint8)
            x, y = 8 + 2 * t + 2 * si, 6 + t
            img[y:y + 14, x:x + 16] = [240, 200, 60]
            fp = str(fdir / f"f{t}.jpg")
            cv2.imwrite(fp, img)
            frames.append(fp)
        ann = np.zeros((52, 60), np.uint8)
        ann[6:20, 8 + 2 * si:24 + 2 * si] = 1
        ann[30:44, 30:46] = 2
        mp = str(fdir / "m0.png")
        cv2.imwrite(mp, ann)
        masks.append(mp)
        if davis_gt:
            # DAVIS ships a gt mask for EVERY frame with the SAME object
            # ids — must NOT disqualify the sequence from lockstep
            for t in range(1, n_frames):
                mp_t = str(fdir / f"f{t}.png")
                cv2.imwrite(mp_t, ann)
                masks.append(mp_t)
        if mid_entry:
            ann2 = np.zeros((52, 60), np.uint8)
            ann2[20:32, 10:24] = 3
            mp2 = str(fdir / "f2.png")  # aligned by basename to frames[2]
            cv2.imwrite(mp2, ann2)
            masks.append(mp2)
        return Sequence(name=f"vseq{si}", frames=frames,
                        ground_truth_rect=np.zeros((1, 4)), masks=masks)

    seqs = [write_seq(0, 3), write_seq(1, 4, davis_gt=True),
            write_seq(2, 3, mid_entry=True), write_seq(3, 1)]
    from unicorn_tpu.harness._parallel_runners import _introduces_new_ids

    # only the genuinely-new-id sequence is disqualified from lockstep
    assert [_introduces_new_ids(s) for s in seqs] == \
        [False, False, True, False]

    from unicorn_tpu.drivers.vos import VOSDriver

    def fresh():
        return VOSDriver(model, params, input_size=(H, W), max_objects=3,
                         conf_thre=0.0)

    ref = {s.name: run_sequence_vos(fresh(), s) for s in seqs}

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("seq",))
    res = run_dataset_vos_parallel(fresh(), seqs, mesh, verbose=False)

    assert set(res) == {"vseq0", "vseq1", "vseq2", "vseq3"}
    for name in ref:
        assert len(res[name]) == len(ref[name])
        for a, b in zip(res[name], ref[name]):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
