"""Real multi-process bring-up + train-step agreement (SURVEY.md §5.8).

The reference's only distribution mechanism is single-process
``nn.DataParallel`` (/root/reference/main.py:37-38); this repo's
multi-host path is ``crfp_tpu.parallel.sharding.initialize_distributed``
-> ``jax.distributed.initialize``. Here we spawn TWO actual processes on
localhost (coordinator on 127.0.0.1), initialize the distributed runtime
in each, and assert the global runtime state — executed code, not a no-op.

Round 5 (VERDICT r4 task 5): the second test executes the REAL v18 train
step across both processes over the global 'data' mesh (gloo CPU
collectives carry the gradient all-reduce) and asserts numeric agreement
of loss, gradient norm, and the post-update parameter delta with the
single-process run on the identical batch. A missing collectives backend
fails these tests loudly (no silent 'skipped').
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["CRFP_REPO"])
coordinator = os.environ["CRFP_COORD"]
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    has_gloo = True
except Exception:
    has_gloo = False

from crfp_tpu.parallel.sharding import initialize_distributed, global_mesh

pid = int(sys.argv[1])
multi = initialize_distributed(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
assert multi, "initialize_distributed returned single-process"
assert jax.process_count() == 2, jax.process_count()
assert jax.process_index() == pid, (jax.process_index(), pid)
n_local = len(jax.local_devices())
n_global = jax.device_count()
assert n_global == 2 * n_local, (n_global, n_local)

# the cross-process collective leg gates hard: this environment ships
# gloo (tests/test_distributed.py round-5), so a failure here is a real
# regression, not an optional feature
assert has_gloo, "jax_cpu_collectives_implementation=gloo unavailable"
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = global_mesh()
import jax.numpy as jnp

def f(a):
    return a.sum()
arr = jax.make_array_from_callback(
    (n_global, 4), NamedSharding(mesh, P("data")),
    lambda idx: np.ones((1, 4)) * 7.0,
)
total = jax.jit(f)(arr)
assert float(total) == 7.0 * n_global * 4, float(total)

print(f"WORKER{pid} OK local={n_local} global={n_global} psum=ok", flush=True)
"""

_TRAIN_WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["CRFP_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
# the v18 CPU train-step compile dominates this test's runtime on the
# single-core host; the repo's persistent cache makes re-runs fast
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.environ["CRFP_REPO"], ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

pid = int(sys.argv[1])
from crfp_tpu.parallel.sharding import initialize_distributed, global_mesh
assert initialize_distributed(
    coordinator_address=os.environ["CRFP_COORD"], num_processes=2, process_id=pid
)
mesh = global_mesh()

from crfp_tpu.models.crfp import CRFP, ModelConfig
from crfp_tpu.train.loop import (
    TrainConfig, charbonnier_loss, create_train_state, make_train_step)

model = CRFP(ModelConfig(variant="v18", mid_channels=8))
tcfg = TrainConfig(periods=(10,), flow_freeze_iters=0)

rng = np.random.default_rng(7)
B, T, h, s = 2, 2, 8, 8
host = {
    "lr": rng.uniform(0, 1, (B, T, h, h, 3)).astype(np.float32),
    "hr": rng.uniform(0, 1, (B, T, h * s, h * s, 3)).astype(np.float32),
    "mk": np.zeros((B, T, h * s, h * s, 1), np.float32),
}
host["mk"][:, :, 16:48, 16:48] = 1.0
host["fv"] = host["hr"]

shard = NamedSharding(mesh, P("data"))
def glob(x):
    # each process supplies its own batch row of the SAME host batch
    return jax.make_array_from_callback(x.shape, shard, lambda idx: x[idx])
batch = {k: glob(v) for k, v in host.items()}

state = create_train_state(
    model, jax.random.PRNGKey(0), {k: jnp.asarray(v[:1]) for k, v in host.items()}, tcfg)
# host snapshot: the train step donates the state, deleting these buffers
p0 = jax.tree.map(np.asarray, state.params)

def loss_fn(params, b):
    sr = model.apply(params, b["lr"], b["fv"], b["mk"])
    return charbonnier_loss(sr, b["hr"])

gfun = jax.jit(jax.grad(loss_fn), in_shardings=(None, {k: shard for k in batch}))
step = make_train_step(model, tcfg, mesh)

# AOT-compile BEFORE anything executes across processes: the two workers'
# multi-minute CPU compiles interleave arbitrarily on this single-core
# host, and gloo's rendezvous inside the first executed collective has a
# hard 30 s timeout (GetKeyValue). Compilation itself exchanges nothing,
# so compile first, then rendezvous at a coordination-service barrier
# (which takes an explicit long timeout), then execute in lockstep.
gfun_c = gfun.lower(state.params, batch).compile()
step_c = step.lower(state, batch).compile()
from jax._src import distributed
distributed.global_state.client.wait_at_barrier("crfp_compiled", 3_000_000)

grads = gfun_c(state.params, batch)
gnorm = float(np.sqrt(sum(float(np.sum(np.asarray(g, np.float64) ** 2))
                          for g in jax.tree.leaves(grads))))
losses = []
for _ in range(2):
    state, metrics = step_c(state, batch)
    losses.append(float(metrics["loss"]))
dnorm = float(np.sqrt(sum(float(np.sum((np.asarray(a, np.float64) - b) ** 2))
                          for a, b in zip(jax.tree.leaves(state.params),
                                          jax.tree.leaves(p0)))))
print(f"TRAIN{pid} gnorm={gnorm:.8e} loss0={losses[0]:.8e} "
      f"loss1={losses[1]:.8e} dnorm={dnorm:.8e}", flush=True)
# keep both tasks alive until both have finished: the leader (task 0)
# exiting early tears down the coordination service under task 1
distributed.global_state.client.wait_at_barrier("crfp_done", 3_000_000)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_bringup(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    script = _WORKER
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual-device override in the workers
    env["JAX_PLATFORMS"] = "cpu"
    env["CRFP_REPO"] = repo
    env["CRFP_COORD"] = coord
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid} OK" in out, out
    # record whether the cross-process collective actually ran
    joined = "\n".join(outs)
    assert "psum=" in joined


@pytest.mark.slow
def test_two_process_train_step_agreement():
    """The real v18 train step executed across TWO processes over the
    global mesh agrees numerically with the single-process run on the
    identical batch: same gradient norm, same loss trajectory, same
    post-update parameter delta (VERDICT r4 task 5)."""
    import re

    import jax
    import jax.numpy as jnp
    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 real CPU device per worker process
    env["JAX_PLATFORMS"] = "cpu"
    env["CRFP_REPO"] = repo
    env["CRFP_COORD"] = coord
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _TRAIN_WORKER, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for pid in range(2)
    ]

    # single-process reference on the identical batch, computed while the
    # workers run (same seeds, same init key)
    import jax as _jax_cfg

    _jax_cfg.config.update("jax_compilation_cache_dir",
                           os.path.join(repo, ".jax_cache"))
    _jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from crfp_tpu.models.crfp import CRFP, ModelConfig
    from crfp_tpu.train.loop import (
        TrainConfig, charbonnier_loss, create_train_state, make_train_step)

    model = CRFP(ModelConfig(variant="v18", mid_channels=8))
    tcfg = TrainConfig(periods=(10,), flow_freeze_iters=0)
    rng = np.random.default_rng(7)
    B, T, h, s = 2, 2, 8, 8
    host = {
        "lr": rng.uniform(0, 1, (B, T, h, h, 3)).astype(np.float32),
        "hr": rng.uniform(0, 1, (B, T, h * s, h * s, 3)).astype(np.float32),
        "mk": np.zeros((B, T, h * s, h * s, 1), np.float32),
    }
    host["mk"][:, :, 16:48, 16:48] = 1.0
    host["fv"] = host["hr"]
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    state = create_train_state(
        model, jax.random.PRNGKey(0), {k: v[:1] for k, v in batch.items()}, tcfg)
    # host snapshot: the train step donates the state, deleting these buffers
    p0 = jax.tree.map(np.asarray, state.params)

    def loss_fn(params, b):
        sr = model.apply(params, b["lr"], b["fv"], b["mk"])
        return charbonnier_loss(sr, b["hr"])

    grads = jax.jit(jax.grad(loss_fn))(state.params, batch)
    ref_gnorm = float(np.sqrt(sum(float(np.sum(np.asarray(g, np.float64) ** 2))
                                  for g in jax.tree.leaves(grads))))
    step = make_train_step(model, tcfg)
    ref_losses = []
    for _ in range(2):
        state, metrics = step(state, batch)
        ref_losses.append(float(metrics["loss"]))
    ref_dnorm = float(np.sqrt(sum(float(np.sum((np.asarray(a, np.float64) - b) ** 2))
                                  for a, b in zip(jax.tree.leaves(state.params),
                                                  jax.tree.leaves(p0)))))

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=2700)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed train workers timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        m = re.search(
            rf"TRAIN{pid} gnorm=(\S+) loss0=(\S+) loss1=(\S+) dnorm=(\S+)", out)
        assert m, out[-3000:]
        gnorm, loss0, loss1, dnorm = (float(x) for x in m.groups())
        # different all-reduce orderings move f32 sums in the last ulps
        assert abs(gnorm - ref_gnorm) <= 2e-4 * ref_gnorm, (gnorm, ref_gnorm)
        assert abs(loss0 - ref_losses[0]) <= 1e-4 * ref_losses[0], (loss0, ref_losses)
        assert abs(loss1 - ref_losses[1]) <= 1e-4 * ref_losses[1], (loss1, ref_losses)
        assert abs(dnorm - ref_dnorm) <= 2e-4 * ref_dnorm, (dnorm, ref_dnorm)
