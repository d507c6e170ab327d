#!/bin/bash
# Round-4 measurement campaign on the real TPU chip (run on an IDLE host:
# round 3's null artifacts came from a contended chip — see VERDICT r3).
#
#   1. default bench under `timeout 600` from a cold process, warm
#      compile cache — the driver-window done-condition (VERDICT r4 #1)
#   2. bench --infer        — first recorded serving-path number (#4)
#   3. bench --no-flash     — attribute the Pallas flash-attention win
#   4. bench --no-ema-freeze — attribute the frozen-subtree EMA skip
#   5. bench --no-share-text-encoder — attribute the shared frozen pass
#
# Variants 3-5 each cold-compile their graph through the remote tunnel
# (~20-50 min each, persisted to /root/.cache/jax_cc_tpu), so reruns are
# warm. Results land in docs/bench_r4/<name>.json + .err.
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
OUT=docs/bench_r4
mkdir -p "$OUT"

run() {
  local name="$1" tmo="$2"; shift 2
  echo "[campaign $(date -u +%H:%M:%S)] $name: timeout $tmo python bench.py $*"
  timeout "$tmo" python bench.py "$@" > "$OUT/$name.json" 2> "$OUT/$name.err"
  local rc=$?
  echo "[campaign $(date -u +%H:%M:%S)] $name rc=$rc: $(tail -c 300 "$OUT/$name.json")"
  return $rc
}

run default_warm_600 600
run infer 4200 --infer
run no_flash 4200 --no-flash
run no_ema_freeze 4200 --no-ema-freeze
run no_share_text_encoder 4200 --no-share-text-encoder
echo "[campaign $(date -u +%H:%M:%S)] done"
