"""Spatial partitioning (parallel/spatial.py): one frame's H axis sharded
over a mesh must decode the SAME detections as the single-device forward
(XLA inserts conv halo exchanges + GN psums; only fp reduction order may
differ)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from unicorn_tpu.models.heads import decode_for_inference
from unicorn_tpu.models.unicorn import Unicorn
from unicorn_tpu.ops.nms import postprocess_device
from unicorn_tpu.parallel.spatial import spatial_detect_fn, spatial_sharding

H, W = 128, 64


def _tiny_model_params():
    model = Unicorn(num_classes=1, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    rng = np.random.RandomState(0)
    frame = jnp.asarray(rng.rand(1, H, W, 3).astype(np.float32) * 255)
    params = model.init(jax.random.PRNGKey(0), frame, method=Unicorn.init_all)
    return model, params


def test_spatial_forward_matches_single_device():
    model, params = _tiny_model_params()
    # sp=4 over the deepest stride-32 map (H/32 = 4 rows): every shard needs
    # halo rows from its neighbors for the 3x3 convs — the hard case
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    fn = spatial_detect_fn(model, mesh, num_classes=1, conf_thre=0.01,
                           nms_thre=0.8, n_cand=32, max_out=16)
    rng = np.random.RandomState(3)
    frames_np = rng.rand(2, H, W, 3).astype(np.float32) * 255

    frames_sp = jax.device_put(frames_np, spatial_sharding(mesh))
    dets_sp, valid_sp = jax.tree_util.tree_map(
        np.asarray, fn(params, frames_sp))

    def single(params, frames):
        raw, _ = model.apply(params, frames, method=Unicorn.forward_whole)
        dec = decode_for_inference(raw, (8, 16, 32), mode="mot")
        return postprocess_device(dec, num_classes=1, conf_thre=0.01,
                                  nms_thre=0.8, class_agnostic=True,
                                  n_cand=32, max_out=16)

    dets_1, valid_1 = jax.tree_util.tree_map(
        np.asarray, jax.jit(single)(params, jnp.asarray(frames_np)))

    # fp reduction order differs under sharding (GN psums), so a candidate
    # whose score sits exactly at conf_thre could legitimately flip its
    # valid bit. Require agreement only where the single-device score is
    # clear of the threshold; for this fixture every candidate is.
    score = dets_1[..., 4] * dets_1[..., 5]
    clear = ~valid_1.astype(bool) | (np.abs(score - 0.01) > 1e-4)
    assert clear.all(), "fixture has near-threshold scores; adjust conf_thre"
    assert np.array_equal(valid_sp, valid_1)
    m = valid_1.astype(bool)
    np.testing.assert_allclose(dets_sp[m], dets_1[m], rtol=2e-4, atol=2e-3)
