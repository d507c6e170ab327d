"""The driver runs `python bench.py` at round end and parses its single
JSON stdout line; a regression here silently zeroes the recorded
benchmark. Exercise the real CLI in a fresh subprocess (the way the
driver does), smoke config on CPU."""

import json
import os
import subprocess
import sys


import pytest

pytestmark = pytest.mark.slow  # bench.py CLI smoke compiles, ~2-11 min

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_json_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize: don't pin the TPU plugin
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py"), "--smoke"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines}"
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline",
                "baseline_source", "value_sustained", "value_burst"):
        assert key in rec, f"missing key {key}"
    assert rec["metric"] == "gan_train_step_throughput"
    assert rec["unit"] == "imgs/sec/chip"
    assert rec["value"] == rec["value_sustained"]  # sustained is the headline
    assert rec["baseline_source"] in ("derived", "persisted", "fallback")
    assert rec["value"] > 0


def test_bench_infer_smoke_json_contract():
    """--infer benches the generator-forward (serving) path with the
    same one-JSON-line contract (BASELINE: train AND infer imgs/sec)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, os.path.join(REPO_ROOT, "bench.py"), "--smoke", "--infer"],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert out.returncode == 0, (out.stdout[-500:], out.stderr[-2000:])
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be ONE JSON line, got: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "gan_inference_throughput"
    assert rec["unit"] == "imgs/sec/chip"
    assert rec["value"] == rec["value_sustained"] and rec["value"] > 0
