#!/usr/bin/env bash
# Start-of-round mechanical step (VERDICT r10 #1): the driver has just
# written CORRECTNESS_r{N}.json, so the committed CORE_ORDER (stamped
# CORE_ORDER_THROUGH_ROUND = N-1) must be re-derived over the history
# that now includes round N, advancing the stamp. Run this FIRST each
# round, before editing window_policy.CHANGED_SINCE_GREEN for the
# round's code changes (rerun it after that edit too — the generator
# folds CHANGED_SINCE_GREEN into tier 2).
#
# Usage: bash scripts/round_start.sh   (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/gen_window.py
python -m pytest tests/test_window_policy.py -q
echo "ROUND START OK — commit the regenerated registry.py"
