"""End-to-end training_loop smoke: grad accumulation via --batch-gpu,
ADA cadence, ticks, snapshots, stats sinks, and resume (the host-loop
layer the per-step tests don't touch; ROADMAP grad-accum CLI item).

Runs in a fresh 2-virtual-device subprocess: see
tests/_train_loop_driver.py for why (XLA:CPU collective-rendezvous
hard-timeout aborts on this 1-core host when run in-process on the
suite's 8-device mesh).
"""

import os
import subprocess
import sys



import pytest

pytestmark = pytest.mark.slow  # full train-step subprocess compile, ~8-13 min

def test_training_loop_grad_accum_ada_and_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    from __graft_entry__ import CPU_COLLECTIVE_TIMEOUT_FLAGS

    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2"
                        + CPU_COLLECTIVE_TIMEOUT_FLAGS)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "tests", "_train_loop_driver.py"),
         str(tmp_path)],
        cwd=repo, env=env, capture_output=True, text=True, timeout=2700,
    )
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-4000:])
    assert "TRAIN_LOOP_E2E OK" in out.stdout
    # Startup module summaries (reference training_loop.py:149-160) must
    # appear in the chief's log.
    assert "Generator Summary" in out.stdout
    assert "Discriminator Summary" in out.stdout
