"""True multi-process "multi-host" test: two OS processes, each owning part
of a global CPU device mesh, run ONE unified train step with the batch
assembled from per-process local slices (parallel/mesh.shard_batch) and must
agree on the loss — the thing the reference could never test without a GPU
cluster (SURVEY.md §4.4: "no fake/mock comm backends")."""
import pytest

import os
import socket
import subprocess
import sys

import numpy as np

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r'''
import os, sys
proc_id = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(r"%(repo)s", ".jax_cache_cpu"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass
# ALL heavy imports happen BEFORE jax.distributed.initialize: the first
# collective after init must come fast on both processes because gloo's
# context handshake has a 30s deadline, and optax/flax imports alone can
# skew the processes by minutes when the 1-core box is contended
import numpy as np, jax.numpy as jnp, optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from unicorn_tpu.core.train_state import TrainState
from unicorn_tpu.core.train_step import make_uni_train_step
from unicorn_tpu.models.unicorn import Unicorn
from unicorn_tpu.parallel.mesh import replicate_state, shard_batch
from unicorn_tpu.parallel.multihost import initialize_multihost, local_batch_slice

initialize_multihost(coordinator_address=f"127.0.0.1:{port}",
                     num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc

H = W = 64
B_global = 4
mesh = Mesh(np.asarray(jax.devices()), ("data",))
# establish the cross-process gloo context FIRST with a tiny psum, before
# any big trace skews the processes
warm = shard_batch(mesh, np.ones((B_global // nproc, 1), np.float32))
wsum = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(warm)
assert float(wsum) == B_global
model = Unicorn(num_classes=8, backbone_name="csp_darknet", depth=0.33,
                width=0.25, in_channels=(256, 512, 1024),
                interact_mode="conv", n_layer_att=0, use_attention=False)
rng = np.random.RandomState(0)  # same global batch materialized on each host
images_g = rng.rand(B_global, 2, H, W, 3).astype(np.float32) * 255
targets_g = np.zeros((B_global, 2, 5, 6), np.float32)
targets_g[:, :, 0] = [1, 32, 32, 20, 20, 1]
task_g = np.asarray([1, 2, 1, 2], np.int32)

params = model.init(jax.random.PRNGKey(0),
                    jnp.asarray(images_g[:1, 0]), method=Unicorn.init_all)
state = TrainState.create(params, optax.adamw(1e-4))

state = replicate_state(mesh, state)
start, per = local_batch_slice(B_global)
batch = shard_batch(mesh, (images_g[start:start + per],
                           targets_g[start:start + per],
                           task_g[start:start + per]))
step = make_uni_train_step(model, (H, W), donate=False)
with mesh:
    state, loss_dict = step(state, *batch)
print(f"LOSS {float(loss_dict['total_loss']):.6f}", flush=True)
'''


def _spawn_once(worker, env):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    return procs, outs


def test_two_process_dp_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER % {"repo": REPO})
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep +
               os.environ.get("PYTHONPATH", ""))
    procs, outs = _spawn_once(worker, env)
    if any(p.returncode != 0 for p in procs) and \
            any("DEADLINE_EXCEEDED" in o for o in outs):
        # gloo's 30s context handshake can time out when this 1-core box is
        # heavily contended (process skew) — an environment flake, not a
        # product failure; retry once
        procs, outs = _spawn_once(worker, env)
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        line = [l for l in out.splitlines() if l.startswith("LOSS ")]
        if p.returncode != 0 and line and "Shutdown barrier" in out:
            # The DP step completed (LOSS printed) but process TEARDOWN hit
            # the coordination-service shutdown-barrier deadline — compile
            # skew between the two procs on this 1-core box can exceed it.
            # The property under test (cross-process grad psum agreement)
            # already held; don't fail on the infra teardown race.
            pass
        else:
            assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert line, f"proc {i} printed no loss:\n{out[-3000:]}"
        losses.append(float(line[0].split()[1]))
    assert np.isfinite(losses[0])
    # both controllers observe the same global loss (grad psum spans hosts)
    assert abs(losses[0] - losses[1]) < 1e-5, losses
