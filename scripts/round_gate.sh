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
# Per-query 2x-of-baseline assertion (VERDICT r4 #3): the BASELINE.md
# round-1 sf0.1 numbers are the reference; a query past 2x fails the
# gate so a perf regression can never ship silently in a snapshot.
BASELINE = {
    'join_four_hop_chain': 1.98, 'agg_multi_counter': 1.22,
    'join_two_hop': 1.13, 'agg_group_topn': 1.38,
    'win_lag_running_sum': 0.50, 'win_session_batch': 0.54,
    'dedup_minhash_lsh': 2.54, 'dedup_ngram_jaccard': 1.06,
    'sim_cosine_topk': 0.58, 'dedup_embedding_cosine': 0.69,
    'text_fingerprint': 1.69, 'graph_reachability': 1.59,
    'sink_upsert_node': 0.67, 'mm_binary_features': 0.63,
}
weak = {q: (t, BASELINE[q]) for q, t in j['queries'].items()
        if q in BASELINE and t > 2 * BASELINE[q]}
assert not weak, f'queries over 2x baseline: {weak}'
print(f'bench OK: total {j[\"value\"]}s over {len(j[\"queries\"])} queries at sf={j[\"sf\"]}')
"
echo "GATE PASSED"
