#!/bin/bash
# Long-run training-stability evidence on the real TPU chip
# (round-2 VERDICT item 5: "a few-thousand-step full-config training",
# reference design point: training/training_loop.py 25,000-kimg runs).
#
# Builds a structured synthetic banner dataset (learnable grammar —
# layoutdetr_tpu/data/synthetic.py structured mode), then trains the
# full production config (768-wide 12-layer BERT, t=256, 256^2
# backgrounds, batch 16, bf16, ADA) with in-training layout-FID +
# overlap/alignment metric evals. Artifacts land in
# runs_stability/<id>-.../{stats.jsonl,metric-*.jsonl,log.txt};
# summarize with tools/stability_report.py.
#
# Usage:  nohup bash tools/run_stability.sh > runs_stability/launch.log 2>&1 &
# Stop:   tools/stop_stability.sh     (clean SIGTERM via recorded pid —
#         REQUIRED before any driver bench/dryrun window: a live run
#         contends for the chip and the single CPU core, which nulled
#         round 3's BENCH/MULTICHIP artifacts)
# Resume: relaunch with STAB_RESUME=<run_dir>/network-snapshot-XXXXXX
#
# Env knobs: STAB_KIMG (default 200), STAB_MAX_HOURS (hard wall-clock
# bound, default 6; the run checkpoints every snapshot so a timeout
# loses at most one snapshot interval), STAB_METRIC_TICKS (default 2).
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
KIMG="${STAB_KIMG:-200}"
MAX_HOURS="${STAB_MAX_HOURS:-6}"
METRIC_TICKS="${STAB_METRIC_TICKS:-2}"
SNAP="${STAB_SNAP:-25}"   # ticks (=kimg at --tick 1) between snapshots

mkdir -p runs_stability/data
if [ ! -f runs_stability/data/train.zip ]; then
  python - <<'EOF'
from layoutdetr_tpu.data.synthetic import make_synthetic_zip
make_synthetic_zip("runs_stability/data/train.zip", num_samples=1024,
                   image_size=256, max_elements=9, seed=1, structured=True)
make_synthetic_zip("runs_stability/data/val.zip", num_samples=128,
                   image_size=256, max_elements=9, seed=2, structured=True)
print("dataset built")
EOF
fi

RESUME_ARGS=()
if [ -n "${STAB_RESUME:-}" ]; then
  KIMG_DONE="$(basename "$STAB_RESUME" | sed 's/network-snapshot-0*//')"
  RESUME_ARGS=(--resume "$STAB_RESUME" --resume-kimg "${KIMG_DONE:-0}")
fi

MAX_SECS="$(awk -v h="$MAX_HOURS" 'BEGIN{printf "%d", h*3600}')"  # fractional hours OK
# exec keeps $$ for the GNU `timeout` wrapper (NOT train.py itself);
# timeout forwards TERM to train.py and --kill-after escalates the
# whole thing if the trainer ignores it. stop_stability.sh's own
# SIGKILL escalation therefore targets the process GROUP.
echo $$ > /tmp/stab_train.pid
exec timeout --signal=TERM --kill-after=180 "$MAX_SECS" python train.py \
  --outdir runs_stability \
  --data runs_stability/data/train.zip \
  --batch 16 --bf16 \
  --kimg "$KIMG" --tick 1 --snap "$SNAP" \
  --metric-ticks "$METRIC_TICKS" \
  --aug ada \
  --metrics layout_fid50k_val,overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val \
  --desc stability "${RESUME_ARGS[@]}"
