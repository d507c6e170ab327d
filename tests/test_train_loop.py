"""End-to-end training_loop smoke: grad accumulation via --batch-gpu,
ADA cadence, ticks, snapshots, stats sinks, and resume (the host-loop
layer the per-step tests don't touch; ROADMAP grad-accum CLI item)."""

import json
import os

import numpy as np
import pytest

import jax

from layoutdetr_tpu.models.generator import GeneratorConfig

# vocab stays at the real 30524: training_loop builds its own dataset
# whose tokenizer emits genuine BERT-range ids.
TINY = GeneratorConfig(
    hidden_dim=16, bert_f_dim=32, bert_num_heads=2, bert_num_encoder_layers=1,
    bert_num_decoder_layers=1, bert_intermediate_size=64,
    bert_max_position_embeddings=32, im_f_dim=16, max_text_length=16,
    nhead=2, num_encoder_layers=1, num_decoder_layers=1, dim_feedforward=32,
    background_size=32, max_elements=9,
)


def test_training_loop_grad_accum_ada_and_resume(tmp_path):
    from layoutdetr_tpu.data.synthetic import make_synthetic_zip
    from layoutdetr_tpu.training.train_loop import training_loop

    zip_path = make_synthetic_zip(str(tmp_path / "train.zip"), num_samples=8,
                                  image_size=32, max_elements=3)
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)

    n_dev = len(jax.devices())
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
    assert last[key]["num"] >= 2

    snaps = [f for f in os.listdir(run_dir) if f.startswith("network-snapshot-")
             and not f.endswith(".json")]
    assert snaps, "no network snapshot written"
    snap_path = os.path.join(run_dir, sorted(snaps)[-1])
    assert os.path.exists(snap_path + ".gcfg.json")

    # Resume from the snapshot: step counter restores.
    state2 = training_loop(
        run_dir=str(tmp_path / "run2"), data=zip_path, gcfg=TINY,
        batch_size=batch, batch_gpu=1, total_kimg=1, kimg_per_tick=1,
        network_snapshot_ticks=None, image_snapshot_ticks=None,
        max_steps=1, resume=snap_path,
    )
    assert int(np.asarray(state2.step)) == 4
