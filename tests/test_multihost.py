"""Two-process multi-host smoke test (VERDICT round 1, item 5).

Spawns 2 CPU processes via ``jax.distributed.initialize`` (2 local
devices each -> a 4-device global 'data' mesh) and exercises the two
code paths nothing single-process can reach:

- ``shard_batch``'s host_local_array_to_global_array branch
  (parallel/mesh.py) — each process contributes its local slice of the
  global batch, and a jitted step consumes the global array;
- ``Collector._sync``'s process_allgather branch (utils/stats.py) —
  per-process reported moments must SUM across processes.

Reference behavior matched: train.py:31-38 (process group init),
training_stats.py:232-264 (cross-rank moment all_reduce).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=2"
    " --xla_cpu_collective_call_terminate_timeout_seconds=900"
    " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address={coord!r},
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
import numpy as np
from layoutdetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from layoutdetr_tpu.utils.stats import Collector

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, len(jax.devices())

mesh = make_mesh()

# --- shard_batch global-array branch + a jitted "train step" ---------
# Global batch 8 = 2 processes x local 4; values encode global position.
local = np.arange(4, dtype=np.float32) + 4.0 * pid
batch = shard_batch({{"x": local[:, None] * np.ones((1, 3), np.float32),
                      "lr": np.float32(0.5)}}, mesh)
params = replicate({{"w": jnp.ones((3,), jnp.float32)}}, mesh)

@jax.jit
def step(params, batch):
    def loss(p):
        return jnp.mean((batch["x"] @ p["w"]) ** 2)
    g = jax.grad(loss)(params)
    return {{"w": params["w"] - batch["lr"] * g["w"]}}, loss(params)

params, l = step(params, batch)
# Global mean over x in 0..7: loss = mean((3*x)^2) = 9 * mean(x^2) = 9*17.5
np.testing.assert_allclose(float(l), 9.0 * 17.5, rtol=1e-5)
w = np.asarray(jax.device_get(params["w"]))
assert np.isfinite(w).all()

# --- Collector cross-process moment sum ------------------------------
c = Collector()
c.report("Loss/test", np.full(2, float(pid + 1)))  # proc0: [1,1], proc1: [2,2]
c.update()
mean = c.mean("Loss/test")
# Summed moments: n=4, sum=6 -> mean 1.5 on BOTH processes.
np.testing.assert_allclose(mean, 1.5, rtol=1e-9)
print(f"proc {{pid}} OK mean={{mean}}")
"""


def test_two_process_mesh_and_stats(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = _WORKER.format(repo=REPO_ROOT, coord=f"localhost:{port}")
    script_path = tmp_path / "worker.py"
    script_path.write_text(script)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2"
                        " --xla_cpu_collective_call_terminate_timeout_seconds=900"
                        " --xla_cpu_collective_call_warn_stuck_timeout_seconds=300")
    procs = [
        subprocess.Popen([sys.executable, str(script_path), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} OK" in out


def test_check_replica_consistency():
    """Snapshot-time replica check (reference check_ddp_consistency,
    training_loop.py:402-405): identical replicas pass, a divergent
    replica raises, deliberately-sharded leaves are skipped."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from layoutdetr_tpu.utils.misc import check_replica_consistency

    devs = jax.devices()[:2]
    mesh = Mesh(np.array(devs), ("data",))
    replicated = NamedSharding(mesh, P())

    good = jax.device_put(np.arange(8.0), replicated)
    check_replica_consistency({"w": good})

    bad = jax.make_array_from_single_device_arrays(
        (8,), replicated,
        [jax.device_put(np.full(8, float(i)), d) for i, d in enumerate(devs)])
    with pytest.raises(AssertionError, match="Replica mismatch"):
        check_replica_consistency({"w": bad})

    # A tensor-parallel (sharded) leaf holds different slices by design.
    sharded = jax.device_put(np.arange(8.0), NamedSharding(mesh, P("data")))
    check_replica_consistency({"w": sharded})


@pytest.mark.slow
def test_tensor_parallel_mesh_step():
    """2-D (data, model) mesh: TP param shardings (Megatron column/row
    layout over the BERT + transformer-FFN kernels) compile and run one
    hoisted train step with stats matching the pure-DP run.

    Runs in a fresh subprocess (tests/_tp_driver.py): this is the
    suite's heaviest XLA:CPU collective workload, and the rendezvous
    hard-timeout SIGABRTs the host process when run in-suite on this
    1-core machine.
    """
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import CPU_COLLECTIVE_TIMEOUT_FLAGS

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8"
                        + CPU_COLLECTIVE_TIMEOUT_FLAGS)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", "import _tp_driver; _tp_driver.main()"],
        cwd=os.path.join(repo, "tests"), env=env,
        capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-4000:])
    assert "TP_MESH OK" in out.stdout
