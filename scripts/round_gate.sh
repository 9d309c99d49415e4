#!/usr/bin/env bash
# End-of-round gate (VERDICT r2 #4): no snapshot commit without a fully
# green test suite AND a parsed bench JSON. Round 2 shipped an unexecuted
# rewrite in its final commit, losing the round's only perf measurement —
# this makes that structurally impossible.
#
# Usage: bash scripts/round_gate.sh   (from the repo root)
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== gate 1/2: pytest =="
python -m pytest tests/ -q

echo "== gate 2/2: bench =="
out=$(python bench.py 2>/dev/null | tail -1)
echo "$out" | python -c "
import json, sys
j = json.loads(sys.stdin.read())
assert j['unit'] == 'sec' and j['queries'], 'bench JSON missing timings'
print(f'bench OK: total {j[\"value\"]}s over {len(j[\"queries\"])} queries at sf={j[\"sf\"]}')
"
echo "GATE PASSED"
