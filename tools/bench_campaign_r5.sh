#!/bin/bash
# Round-5 measurement campaign (VERDICT r4 items 1, 4, 6).
#
# Prereq: IDLE machine (no pytest, no stability run — see RELEASE.md).
# Produces:
#   docs/bench_r5/feed_before.jsonl / feed_after.jsonl / feed_autoT.jsonl
#       — train.py stats.jsonl copies for the host-feed A/B and the
#         --max-text-length auto end-to-end comparison (sec/kimg)
#   docs/bench_r5/interleaved.tsv — bracket-relative bench rows for
#       --text-len 64 (auto-T device step) and --no-share-text-encoder
#
# Usage: bash tools/bench_campaign_r5.sh [phase...]
#   phases: warm ab feed   (default: all)
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
mkdir -p docs/bench_r5
PHASES="${*:-warm ab feed}"

run_train() {  # tag, extra args...
  local tag="$1"; shift
  local out="docs/bench_r5/runs_$tag"
  rm -rf "$out"; mkdir -p "$out"
  echo "=== train.py $tag: $* ==="
  timeout 2400 python train.py \
    --outdir "$out" \
    --data runs_stability/data/train.zip \
    --batch 16 --bf16 --kimg 3 --tick 1 --snap 100 \
    --metrics none --desc "$tag" "$@" \
    > "docs/bench_r5/train_$tag.log" 2>&1
  local rc=$?
  local run_dir
  run_dir=$(ls -d "$out"/0* 2>/dev/null | head -1)
  [ -n "$run_dir" ] && cp "$run_dir/stats.jsonl" "docs/bench_r5/feed_$tag.jsonl" 2>/dev/null
  echo "train $tag rc=$rc; stats:"
  [ -n "$run_dir" ] && python - "$run_dir/stats.jsonl" <<'EOF'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
sk = [r["sec_per_kimg"] for r in rows if "sec_per_kimg" in r]
print("  sec/kimg per tick:", [round(x,1) for x in sk])
EOF
}

if echo "$PHASES" | grep -q warm; then
  # Warm the TPU compile cache for the bench variant graphs so the
  # interleaved brackets never eat a cold compile.
  echo "=== warming bench graphs ==="
  timeout 3600 python bench.py --text-len 64 > docs/bench_r5/warm_t64.log 2>&1
  echo "t64 warm rc=$?"
  timeout 3600 python bench.py --no-share-text-encoder > docs/bench_r5/warm_noshare.log 2>&1
  echo "noshare warm rc=$?"
  timeout 1200 python bench.py > docs/bench_r5/warm_default.log 2>&1
  echo "default warm rc=$?"
fi

if echo "$PHASES" | grep -q ab; then
  # bench_interleaved_ab.sh writes to docs/bench_r4; interleave inline
  # here against docs/bench_r5 instead.
  OUT=docs/bench_r5/interleaved.tsv
  one() {
    local tag="$1"; shift
    local js
    js=$(timeout 900 python bench.py "$@" 2>>docs/bench_r5/interleaved.err)
    local sust burst
    sust=$(python -c "import json,sys;print(json.loads(sys.argv[1])['value_sustained'])" "$js" 2>/dev/null)
    burst=$(python -c "import json,sys;print(json.loads(sys.argv[1])['value_burst'])" "$js" 2>/dev/null)
    echo -e "$(date -u +%H:%M:%S)\t$tag\t$sust\t$burst" | tee -a "$OUT"
  }
  touch "$OUT"
  for i in 1 2; do
    one default
    one --text-len-64 --text-len 64
  done
  one default
  for i in 1 2; do
    one --no-share-text-encoder --no-share-text-encoder
  done
  one default
  python tools/bench_ab_report.py "$OUT" --markdown | tee docs/bench_r5/ab_report.md
fi

if echo "$PHASES" | grep -q feed; then
  # Host-feed A/B at the stability config (VERDICT r4 item 1):
  # before = round-4 behavior (no cache, single thread);
  # after  = round-5 default (warm in-RAM cache).
  LAYOUTDETR_CACHE_GB=0 run_train before --workers 0
  run_train after
  # --max-text-length auto end-to-end (VERDICT r4 item 4).
  run_train autoT --max-text-length auto
fi
echo "campaign done"
