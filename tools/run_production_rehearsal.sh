#!/bin/bash
# Real-data-scale rehearsal, fully offline (VERDICT r4 item 5).
#
# De-risks the day the real 14.7 GB ad-banner set appears by pushing a
# production-SHAPED dataset through the exact pipeline the real one
# will take (README "Data preprocessing"; reference dataset_tool.py:83-243):
#
#   1. tools/make_production_source.py — 7,672 pages, IAB banner
#      dimensions up to 1024px, 1-9 rendered elements each, inpainted-
#      style backgrounds (= the reference dataset's page count).
#   2. dataset_tool.py — two streaming passes (90/10 split from PNG
#      headers, pixels stream to the zip; peak RAM is one page).
#   3. train.py --load-patches for >= 10 kimg — the FULL host I/O path
#      (per-element patch + patch_orig + mask decodes, ~50/sample, which
#      the reference loader always pays: dataset_layoutganpp.py:281-328)
#      plus the warm in-RAM background/token cache and multi-process
#      prefetch, measured end-to-end via stats.jsonl sec/kimg.
#
# Artifacts: docs/bench_r5/rehearsal_{source,convert,train}.log,
#            docs/bench_r5/rehearsal_stats.jsonl, and a summary line in
#            docs/bench_r5/rehearsal_summary.txt.
#
# Env knobs: REH_PAGES (default 7672), REH_KIMG (default 10),
#            REH_ROOT (default /tmp/prod_rehearsal — gitignored scratch).
set -u
cd "$(dirname "$0")/.."
export HF_HUB_OFFLINE=1 TRANSFORMERS_OFFLINE=1
PAGES="${REH_PAGES:-7672}"
KIMG="${REH_KIMG:-10}"
ROOT="${REH_ROOT:-/tmp/prod_rehearsal}"
OUT=docs/bench_r5
mkdir -p "$OUT"

# GNU time is absent on some hosts (this VM); tools/peakrss.py prints
# the same "Maximum resident set size (kbytes)" line the greps expect.
if [ -x /usr/bin/time ]; then
  MTIME="/usr/bin/time -v"
else
  MTIME="python tools/peakrss.py --"
fi

mark() { echo "[rehearsal $(date -u +%H:%M:%S)] $*" | tee -a "$OUT/rehearsal_summary.txt"; }

if [ ! -f "$ROOT/source/png_json_gt/page$(printf %06d $((PAGES - 1))).json" ]; then
  mark "generating $PAGES-page production-shaped source -> $ROOT/source"
  $MTIME python tools/make_production_source.py \
    --out "$ROOT/source" --pages "$PAGES" \
    > "$OUT/rehearsal_source.log" 2>&1 || { mark "source generation FAILED"; exit 1; }
  grep -E "Maximum resident|done:" "$OUT/rehearsal_source.log" | tail -2 | tee -a "$OUT/rehearsal_summary.txt"
fi

if [ ! -f "$ROOT/zips/train.zip" ]; then
  mark "dataset_tool.py streaming convert -> $ROOT/zips"
  $MTIME python dataset_tool.py --source "$ROOT/source" \
    --dest "$ROOT/zips" --png-compress 3 \
    > "$OUT/rehearsal_convert.log" 2>&1 || { mark "convert FAILED"; exit 1; }
  grep -E "Maximum resident|Elapsed" "$OUT/rehearsal_convert.log" | tee -a "$OUT/rehearsal_summary.txt"
  du -sh "$ROOT/zips"/*.zip | tee -a "$OUT/rehearsal_summary.txt"
fi

mark "train.py $KIMG kimg with --load-patches (full host I/O path)"
rm -rf "$ROOT/runs"
$MTIME timeout 5400 python train.py \
  --outdir "$ROOT/runs" \
  --data "$ROOT/zips/train.zip" \
  --batch 16 --bf16 --kimg "$KIMG" --tick 1 --snap 100 \
  --metrics none --load-patches --desc rehearsal \
  > "$OUT/rehearsal_train.log" 2>&1
RC=$?
RUN_DIR=$(ls -d "$ROOT/runs"/0* 2>/dev/null | head -1)
[ -n "$RUN_DIR" ] && cp "$RUN_DIR/stats.jsonl" "$OUT/rehearsal_stats.jsonl" 2>/dev/null
mark "train rc=$RC"
grep -E "Maximum resident" "$OUT/rehearsal_train.log" | tee -a "$OUT/rehearsal_summary.txt"
[ -f "$OUT/rehearsal_stats.jsonl" ] && python - "$OUT/rehearsal_stats.jsonl" <<'EOF' | tee -a docs/bench_r5/rehearsal_summary.txt
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
sk = [r["sec_per_kimg"] for r in rows if "sec_per_kimg" in r]
if sk:
    post = sk[1:] or sk  # drop the compile tick
    print(f"sec/kimg ticks: {[round(x, 1) for x in sk]}")
    print(f"post-compile median {sorted(post)[len(post)//2]:.1f} s/kimg "
          f"= {1000.0 / sorted(post)[len(post)//2]:.1f} imgs/s wall-clock with full patch I/O")
EOF
mark "rehearsal done"
