"""Enforce COVERAGE.md's robustness claim: oracle parity must hold under
a HOSTILE session topology — local[3], 200 shuffle partitions, AQE off,
non-UTC session timezone — proving the determinism engineering (exact
decimal sums, sequential folds, explicit tie-breaks, two-level prefix
sums) is partitioning-independent. Runs in a subprocess because session
topology is process-wide. A representative query per determinism
mechanism keeps runtime bounded; the full sweep runs in the verify
recipe."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    "agg_multi_counter",        # exact decimal aggregation
    "win_session_batch",        # ordered window + gaps-and-islands
    "dedup_ngram_jaccard",      # materialized index + self-join + df cap
    "sim_cosine_topk",          # sequential float folds + top-k ties
    "text_fingerprint",         # order-independent rolling hash
    "graph_connected_components",  # iterative convergence
    "text_pack_sequences",      # two-level prefix sum (partitioning-sensitive by construction)
    "dedup_simhash_hamming",    # band-join candidates + popcount verify (r4)
    "graph_pagerank",           # fixed-point iterative join/agg rounds (r4)
    "win_funnel_conversion",    # chained prefix windows + same-key agg (r4)
    "sim_kmeans_assign",        # float-fold scores + struct-min argmin tie-break (r4)
    "sim_kmeans_iterate",       # int64 fixed-point Lloyd rounds — exact sums must
                                # hold under any partitioning (r5)
    "sample_temperature_mix",   # source-sorted sequential sqrt-fold rates (r5)
    "stream_session_window",    # streaming session-state merge order (r5)
    "join_asof_nearest",        # shared-sort dual-window candidates + tiebreak (r5)
    "agg_equidepth_histogram",  # GLOBAL ntile — the most partitioning-hostile
                                # shape in the registry (r5)
    "mm_audio_frame_rms",       # Arrow batch boundaries must not move frames (r5)
]

_SCRIPT = f"""
import sys
sys.path.insert(0, {REPO!r}); sys.path.insert(0, {REPO!r} + "/tests")
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[3]")
         .config("spark.sql.shuffle.partitions", "200")
         .config("spark.sql.adaptive.enabled", "false")
         .config("spark.sql.session.timeZone", "Pacific/Kiritimati")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from graph_etl_pipeline_spark.registry import all_queries
from parity import compare
import os
SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
qs = all_queries()
fails = 0
for name in {QUERIES!r}:
    spec = qs[name]
    probs = compare(spec.fn(spark, SF), spec.oracle, SF)
    if probs:
        print("FAIL", name, probs)
        fails += 1
print("FAILS:", fails)
"""


def test_oracle_parity_survives_hostile_topology():
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True, timeout=420
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "FAILS: 0" in r.stdout, r.stdout + r.stderr[-1000:]
