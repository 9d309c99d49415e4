"""Misra-Gries heavy-hitter sketch as a distributed Spark operator.

The brief's "novel sketch" slot: a bounded-memory frequency summary
computed per partition in Arrow batches (mapInPandas), merged by a plain
hash aggregation. The sketch is the 100 TB shape for "which keys are
frequent": per-executor memory is O(k) regardless of key cardinality,
and the merge shuffles at most k rows per partition — versus an exact
groupBy whose shuffle carries every distinct key.

Guarantees (Misra-Gries 1982; merge bound per Agarwal et al.,
"Mergeable Summaries", PODS 2012):
  * estimates never overcount: est(x) ≤ count(x);
  * per-partition undercount ≤ n_p/(k+1), and summing per-key estimates
    across partition sketches keeps the global bound:
    count(x) - est(x) ≤ n/(k+1)  (absent keys contribute estimate 0,
    which is within the same partition bound);
  * hence every key with count(x) > n/(k+1) SURVIVES into the merged
    sketch — the completeness property heavy-hitter queries rely on.

The batch-merge formulation below (add an exact batch count-map, then
truncate back to k counters by subtracting the (k+1)-th largest) is the
mergeable-summaries MERGE operator applied per Arrow batch — identical
bound, vectorized per batch instead of item-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd


def merge_truncate(counters: dict, batch_counts: dict, k: int) -> dict:
    """Merge exact batch counts into an MG summary and truncate to ≤ k
    counters. Subtracting the (k+1)-th largest value from every counter
    (dropping non-positives) removes ≥ 1 count from > k distinct keys at
    a time, which is what bounds total undercount by n/(k+1)."""
    for key, c in batch_counts.items():
        counters[key] = counters.get(key, 0) + int(c)
    if len(counters) > k:
        t = sorted(counters.values(), reverse=True)[k]  # (k+1)-th largest
        counters = {key: c - t for key, c in counters.items() if c > t}
    return counters


def mg_sketch_partitions(k: int):
    """mapInPandas function: one Misra-Gries summary per PARTITION
    (state carried across the partition's Arrow batches), emitted as
    (key, est) rows — at most k per partition, so the downstream merge
    aggregation moves k × n_partitions rows no matter how many distinct
    keys the data holds."""
    import pandas as pd

    def _sketch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        counters: dict = {}
        for b in batches:
            counters = merge_truncate(counters, b["key"].value_counts().to_dict(), k)
        yield pd.DataFrame(
            {"key": list(counters.keys()), "est": list(counters.values())}
        )

    return _sketch
