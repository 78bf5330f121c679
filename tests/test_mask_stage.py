"""VOS+MOTS mask-stage training step on tiny shapes."""
import jax
import jax.numpy as jnp
import numpy as np

from unicorn_tpu.core.train_state import TrainState, make_optimizer
from unicorn_tpu.core.train_step import make_uni_mask_train_step
from unicorn_tpu.losses.vos import match_instance_pairs
from unicorn_tpu.models.unicorn import Unicorn

H = W = 64


def test_match_instance_pairs():
    targets = np.zeros((1, 2, 5, 6), np.float32)
    targets[0, 0, 0, 5] = 7
    targets[0, 0, 1, 5] = 9
    targets[0, 0, 2, 5] = 3   # no partner in frame 1
    targets[0, 1, 0, 5] = 9
    targets[0, 1, 1, 5] = 7
    idx0, idx1, pv = match_instance_pairs(jnp.asarray(targets), 3)
    assert pv[0].tolist() == [True, True, False]
    assert idx0[0].tolist()[:2] == [0, 1]
    assert idx1[0].tolist()[:2] == [1, 0]   # tid 7 -> col 1, tid 9 -> col 0


def test_uni_mask_train_step():
    model = Unicorn(num_classes=1, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False,
                    use_mask=True, use_raft=True)
    rng = np.random.RandomState(0)
    B, M, d_rate = 2, 5, 2
    Hm, Wm = H // d_rate, W // d_rate
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255)
    targets = np.zeros((B, 2, M, 6), np.float32)
    masks = np.zeros((B, 2, M, Hm, Wm), np.float32)
    for b in range(B):
        for f in range(2):
            targets[b, f, 0] = [0, 30, 30, 20, 20, 1]
            targets[b, f, 1] = [0, 45, 40, 16, 16, 2]
            masks[b, f, 0, 10:20, 10:20] = 1
            masks[b, f, 1, 18:26, 20:28] = 1
    task_ids = jnp.asarray([1, 2], jnp.int32)  # VOS + MOTS

    params = model.init(jax.random.PRNGKey(0), images[:1, 0],
                        method=Unicorn.init_all)
    tx = make_optimizer(lambda s: 1e-4, kind="adamw")
    state = TrainState.create(params, tx, use_ema=False)
    step = make_uni_mask_train_step(model, (H, W), d_rate=d_rate,
                                    use_raft=True, donate=False)
    state2, ld = step(state, images, jnp.asarray(targets),
                      task_ids, jnp.asarray(masks))
    for k, v in ld.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert float(ld["condinst_loss_vos"]) > 0
    assert float(ld["condinst_loss_mots"]) > 0
    # params changed
    l0 = jax.tree_util.tree_leaves(state.params)[0]
    l1 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))


def test_det_mask_train_step():
    """Instance-seg stage: det + CondInst mask loss end-to-end."""
    from unicorn_tpu.core.train_step import make_det_mask_train_step
    from unicorn_tpu.core.train_state import TrainState, make_optimizer
    from unicorn_tpu.models.unicorn import YOLOXDet

    model = YOLOXDet(num_classes=5, backbone_name="csp_darknet", depth=0.33,
                     width=0.25, in_channels=(256, 512, 1024),
                     use_attention=False, n_layer_att=0, use_mask=True)
    rng = np.random.RandomState(0)
    B, Mi, d_rate = 1, 6, 4
    Hm, Wm = H // d_rate, W // d_rate
    images = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32) * 255)
    labels = np.zeros((B, Mi, 5), np.float32)
    labels[0, 0] = [1, 30, 30, 20, 20]
    labels[0, 1] = [3, 45, 40, 16, 16]
    masks = np.zeros((B, Mi, Hm, Wm), np.float32)
    masks[0, 0, 5:10, 5:10] = 1
    masks[0, 1, 9:13, 10:14] = 1

    params = model.init(jax.random.PRNGKey(0), images)
    tx = make_optimizer(lambda s: 1e-4, kind="sgd")
    state = TrainState.create(params, tx, use_ema=False)
    step = make_det_mask_train_step(model, (H, W), donate=False)
    state2, ld = step(state, images, jnp.asarray(labels), jnp.asarray(masks))
    assert np.isfinite(float(ld["total_loss"]))
    assert float(ld["condinst_loss"]) > 0
