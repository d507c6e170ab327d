#!/bin/bash
# Long-run training-stability evidence on the real TPU chip
# (round-2 VERDICT item 5: "a few-thousand-step full-config training",
# reference design point: training/training_loop.py 25,000-kimg runs).
#
# Builds a structured synthetic banner dataset (learnable grammar —
# layoutdetr_tpu/data/synthetic.py structured mode), then trains the
# full production config (768-wide 12-layer BERT, t=256, 256^2
# backgrounds, batch 16, bf16, ADA) for 200 kimg (12,500 steps) with
# in-training layout-FID + overlap/alignment metric evals every 25
# ticks. Artifacts land in runs_stability/<id>-.../{stats.jsonl,
# metric-*.jsonl,log.txt}; summarize with tools/stability_report.py.
#
# Usage:  nohup bash tools/run_stability.sh > runs_stability/launch.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
KIMG="${STAB_KIMG:-200}"

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

echo $$ > /tmp/stab_train.pid  # exec below keeps this pid for train.py
exec python train.py \
  --outdir runs_stability \
  --data runs_stability/data/train.zip \
  --batch 16 --bf16 \
  --kimg "$KIMG" --tick 1 --snap 25 \
  --aug ada \
  --metrics layout_fid50k_val,overlap50k_alignment50k_layoutwise_iou50k_layoutwise_docsim50k_val \
  --desc stability
