"""Subprocess driver for the training_loop e2e test.

Run by tests/test_train_loop.py in a FRESH process with
``JAX_PLATFORMS=cpu`` and ``--xla_force_host_platform_device_count=2``:
in-process at the tail of a long suite, or on a wider virtual mesh, the
XLA:CPU collective rendezvous can trip its 40 s hard timeout on this
1-core host and SIGABRT the whole pytest session (see
tests/test_training.py::test_dryrun_multichip_8 for the same pattern).
Two virtual devices keep every per-step psum a 2-thread rendezvous
while still exercising the sharded data path.

Usage: python tests/_train_loop_driver.py <tmp_dir>
"""

import json
import os
import sys

import numpy as np

import jax

from __graft_entry__ import _provision_virtual_devices
from layoutdetr_tpu.models.generator import GeneratorConfig

# The ambient sitecustomize pins the TPU plugin at interpreter start, so
# JAX_PLATFORMS=cpu in the caller's env is not enough — do the
# backend-clear dance (same as the driver's dryrun path).
_provision_virtual_devices(2)

# vocab stays at the real 30524: training_loop builds its own dataset
# whose tokenizer emits genuine BERT-range ids.
TINY = GeneratorConfig(
    hidden_dim=16, bert_f_dim=32, bert_num_heads=2, bert_num_encoder_layers=1,
    bert_num_decoder_layers=1, bert_intermediate_size=64,
    bert_max_position_embeddings=32, im_f_dim=16, max_text_length=16,
    nhead=2, num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
    background_size=32, max_elements=9,
)


def main(tmp_dir: str) -> None:
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip
    from layoutdetr_tpu.training.train_loop import training_loop

    zip_path = make_synthetic_zip(os.path.join(tmp_dir, "train.zip"),
                                  num_samples=8, image_size=32, max_elements=3)
    run_dir = os.path.join(tmp_dir, "run")
    os.makedirs(run_dir, exist_ok=True)

    n_dev = len(jax.devices())
    assert n_dev == 2, f"expected 2 virtual CPU devices, got {n_dev}"
    batch = 2 * n_dev  # per-device batch 2, microbatch 1 -> grad_accum=2
    state = training_loop(
        run_dir=run_dir, data=zip_path, gcfg=TINY, batch_size=batch,
        batch_gpu=1, total_kimg=1, kimg_per_tick=1,
        network_snapshot_ticks=1, image_snapshot_ticks=None,
        max_steps=3, aug="ada", ada_target=0.6,
    )
    assert int(np.asarray(state.step)) == 3

    # Stats sinks: every batch accumulated (not a 1-in-8 subsample).
    stats_lines = [json.loads(l) for l in
                   open(os.path.join(run_dir, "stats.jsonl"))]
    assert stats_lines, "stats.jsonl empty"
    last = stats_lines[-1]
    key = "Loss/D/loss_Dreal"
    assert key in last and np.isfinite(last[key]["mean"])
    # 3 steps -> the tick saw 3 accumulated reports minus the one still
    # in flight; at least 2 must have landed.
    assert last[key]["num"] >= 2, last[key]

    snaps = [f for f in os.listdir(run_dir) if f.startswith("network-snapshot-")
             and not f.endswith(".json")]
    assert snaps, "no network snapshot written"
    snap_path = os.path.join(run_dir, sorted(snaps)[-1])
    assert os.path.exists(snap_path + ".gcfg.json")

    # Resume from the snapshot: step counter restores.
    state2 = training_loop(
        run_dir=os.path.join(tmp_dir, "run2"), data=zip_path, gcfg=TINY,
        batch_size=batch, batch_gpu=1, total_kimg=1, kimg_per_tick=1,
        network_snapshot_ticks=None, image_snapshot_ticks=None,
        max_steps=1, resume=snap_path,
    )
    assert int(np.asarray(state2.step)) == 4

    # Resume parity (reference train.py:290-292): a resumed run must NOT
    # re-ramp the EMA. training_loop forces ema_rampup=None on resume,
    # so after one resumed step the EMA moves by only (1 - beta) of its
    # gap to the live params (beta = 0.5**(batch/ema_nimg) ~ 0.998 at
    # this config). A re-ramping EMA would instead jump ~94% of the way
    # to params_g (ema_nimg capped at cur_nimg * 0.05).
    def tree_dist(a, b):
        sq = jax.tree.map(
            lambda x, y: float(np.sum((np.asarray(x, np.float64)
                                       - np.asarray(y, np.float64)) ** 2)), a, b)
        return float(np.sqrt(sum(jax.tree.leaves(sq))))

    e0 = state.params_gema  # snapshot EMA (snapshot written at run-1 end)
    moved = tree_dist(state2.params_gema, e0)
    gap = tree_dist(state2.params_g, e0)
    assert moved < 0.1 * gap, (
        f"EMA re-ramped on resume: moved {moved:.3e} of gap {gap:.3e}")

    # Graceful preemption (train.py's SIGTERM -> abort_fn wiring): when
    # abort_fn flips True mid-run, the loop must finish the tick, write
    # a final snapshot despite total_kimg being nowhere near reached,
    # and return cleanly — the reference declares this hook but never
    # supplies it (training_loop.py:95-96).
    ticks_seen = {"n": 0}

    def abort_fn():
        ticks_seen["n"] += 1
        return ticks_seen["n"] >= 2

    run_dir3 = os.path.join(tmp_dir, "run3")
    os.makedirs(run_dir3, exist_ok=True)
    state3 = training_loop(
        run_dir=run_dir3, data=zip_path, gcfg=TINY, batch_size=batch,
        batch_gpu=1, total_kimg=1000, kimg_per_tick=0.02,
        network_snapshot_ticks=10_000, image_snapshot_ticks=None,
        abort_fn=abort_fn,
    )
    steps3 = int(np.asarray(state3.step))
    assert 0 < steps3 < 50, f"abort_fn ignored (ran {steps3} steps)"
    # The done-path snapshot overwrites the tick-0 one (same sub-kimg
    # name); its step counter proves it was written AT the abort, not
    # at tick 0.
    from layoutdetr_tpu.utils.checkpoint import restore_checkpoint

    snap3 = restore_checkpoint(
        os.path.join(run_dir3, "network-snapshot-000000"), target=state3)
    assert int(np.asarray(snap3.step)) == steps3, (
        f"final snapshot step {int(np.asarray(snap3.step))} != {steps3}; "
        "abort did not write a done-path snapshot")
    print("TRAIN_LOOP_E2E OK")


if __name__ == "__main__":
    main(sys.argv[1])
