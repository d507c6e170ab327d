#!/bin/bash
# Interleaved A/B bench on the drifting virtualized backend.
#
# Single-flag attribution needs interleaving here: back-to-back
# identical runs of the SAME binary vary ±30% with farm load (measured
# 126 -> 628 imgs/s across windows on an idle host), which swamps most
# flag deltas. This runs  default, variant, default, variant, ...
# so every variant run is bracketed by defaults <=3 min away; report
# the variant/adjacent-default ratio, not absolute numbers.
#
# All graphs must already be in /root/.cache/jax_cc_tpu (run
# tools/bench_campaign_r4.sh once first) — a cold compile inside a
# bracket would poison the pairing.
#
# Usage: bash tools/bench_interleaved_ab.sh <reps> <flag...>
#   e.g.  bash tools/bench_interleaved_ab.sh 2 --no-flash
# Results append to docs/bench_r4/interleaved.tsv:
#   utc  config  sustained  burst
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
REPS="${1:-2}"; shift || true
OUT=docs/bench_r4/interleaved.tsv
mkdir -p docs/bench_r4
touch "$OUT"

one() {  # one bench run; append a TSV row
  local tag="$1"; shift
  local js
  js=$(timeout 900 python bench.py "$@" 2>>docs/bench_r4/interleaved.err)
  local sust burst
  sust=$(python - "$js" <<'EOF'
import json,sys; d=json.loads(sys.argv[1]); print(d["value_sustained"])
EOF
)
  burst=$(python - "$js" <<'EOF'
import json,sys; d=json.loads(sys.argv[1]); print(d["value_burst"])
EOF
)
  echo -e "$(date -u +%H:%M:%S)\t$tag\t$sust\t$burst" | tee -a "$OUT"
}

for i in $(seq 1 "$REPS"); do
  one default
  one "$*" "$@"
done
one default
