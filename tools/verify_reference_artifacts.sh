#!/usr/bin/env bash
# BASELINE-config-1 closure runbook: the moment the real reference
# artifacts exist on disk (2.7 GB layoutdetr_ad_banner.pkl, real
# val.zip, bert-base-uncased vocab, LayoutNet .pth.tar, Inception
# weights), this converts + verifies + measures in one command and
# appends the results to docs/PARITY.md.
#
#   tools/verify_reference_artifacts.sh --pkl ... --data ... \
#       --vocab-dir ... [--layoutnet ...] [--inception ...]
#
# Validate the chain end-to-end today (synthetic artifacts, identical
# code path):
#
#   tools/verify_reference_artifacts.sh --dry-run /tmp/parity_dryrun
set -euo pipefail
cd "$(dirname "$0")/.."
exec python tools/verify_reference_artifacts.py "$@"
