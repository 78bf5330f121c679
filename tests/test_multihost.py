"""Multi-slice pod-mesh path (parallel/multihost.py): the (dcn, data) 2-axis
mesh must carry a full DP train step, with the batch sharded jointly over
both axes (hierarchical psum: ICI inside a slice, DCN across slices).
Simulated as 2 slices x 4 chips on the 8 virtual CPU devices."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from unicorn_tpu.core.train_state import (
    TrainState, default_wd_mask, make_optimizer,
)
from unicorn_tpu.core.train_step import make_uni_train_step
from unicorn_tpu.models.unicorn import Unicorn
from unicorn_tpu.parallel.multihost import (
    initialize_multihost, local_batch_slice, make_pod_mesh,
)


def test_initialize_multihost_noops_single_host():
    initialize_multihost()  # must not raise or try to wire a coordinator


def test_local_batch_slice_single_process():
    start, per = local_batch_slice(16)
    assert (start, per) == (0, 16)


def test_pod_mesh_dp_train_step():
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, ("dcn", "data"))
    # make_pod_mesh on CPU collapses to one slice; build the 2-slice shape
    # explicitly here, same axis names as make_pod_mesh
    assert make_pod_mesh().axis_names == ("dcn", "data")

    H = W = 64
    B, M = 8, 5
    model = Unicorn(num_classes=8, backbone_name="csp_darknet", depth=0.33,
                    width=0.25, in_channels=(256, 512, 1024),
                    interact_mode="conv", n_layer_att=0, use_attention=False)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(B, 2, H, W, 3).astype(np.float32) * 255)
    t = np.zeros((B, M, 6), np.float32)
    t[:, 0] = [0, 32, 32, 20, 20, 1]
    targets = jnp.asarray(np.stack([t, t], 1))
    task_ids = jnp.asarray([1, 2] * (B // 2), jnp.int32)

    params = model.init(jax.random.PRNGKey(0), images[:1, 0],
                        method=Unicorn.init_all)
    tx = make_optimizer(lambda s: 1e-4, kind="adamw",
                        no_decay_mask_fn=default_wd_mask)
    state = TrainState.create(params, tx)

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(("dcn", "data")))  # batch over both axes
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "shape") else x, state)
    images = jax.device_put(images, batch_sh)
    targets = jax.device_put(targets, batch_sh)
    task_ids = jax.device_put(task_ids, batch_sh)

    step = make_uni_train_step(model, (H, W), num_classes=8, donate=False)
    with mesh:
        new_state, loss_dict = step(state, images, targets, task_ids)
    total = float(loss_dict["total_loss"])
    assert np.isfinite(total)
    # params remain replicated after the update
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_multihost_env_detection(monkeypatch):
    """Pod auto-detection fires only on MULTI-host markers: a single-worker
    TPU VM also sets TPU_WORKER_HOSTNAMES (one entry) and must stay
    single-host; >1 workers or an explicit coordinator means multihost."""
    from unicorn_tpu.parallel.multihost import _multihost_env

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("MEGASCALE_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not _multihost_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    assert _multihost_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "host-0:1234")
    assert _multihost_env()


def test_local_batch_slice_rejects_indivisible(monkeypatch):
    """A global batch that doesn't divide over the hosts must raise (a
    silent floor would drop samples every step)."""
    import pytest

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    with pytest.raises(ValueError):
        local_batch_slice(30)
    assert local_batch_slice(32) == (8, 8)
