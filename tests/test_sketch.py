"""Misra-Gries sketch: the worst-case guarantees the heavy-hitter
contract relies on, checked directly on the pure merge kernel and
end-to-end across partitionings."""

from __future__ import annotations

import random
from collections import Counter

from pyspark.sql import functions as F

from graph_etl_pipeline_spark.operators.sketch import merge_truncate
from graph_etl_pipeline_spark.registry import all_queries

from tests.conftest import SF_ORACLE


def _run_mg(items, k, batch: int = 97) -> dict:
    counters: dict = {}
    for i in range(0, len(items), batch):
        counters = merge_truncate(counters, Counter(items[i : i + batch]), k)
    return counters


def test_mg_bounds_hold_on_adversarial_streams():
    rng = random.Random(7)
    for trial in range(20):
        n_keys = rng.choice([5, 40, 300])
        k = rng.choice([8, 32])
        items = [f"k{rng.randrange(n_keys) ** 2 % n_keys}" for _ in range(5000)]
        # plant a hot run mid-stream (adversarial ordering for MG)
        items[2000:2600] = ["hot"] * 600
        exact = Counter(items)
        n = len(items)
        sketch = _run_mg(items, k)
        assert len(sketch) <= k
        for key, est in sketch.items():
            assert est <= exact[key], (trial, key)
            assert exact[key] - est <= n // (k + 1) + 1, (trial, key)
        # completeness: every key above the bound must survive
        for key, c in exact.items():
            if c > n / (k + 1):
                assert key in sketch, (trial, key, c)


def test_mg_merge_is_order_insensitive_on_guarantees():
    """Different batch splits give different internal counters but the
    same guaranteed-retained set."""
    items = ["hot"] * 900 + [f"t{i % 211}" for i in range(4000)]
    n, k = len(items), 16
    for batch in (1, 13, 1000, len(items)):
        sketch = _run_mg(items, k, batch=batch)
        assert "hot" in sketch  # 900 > n/17 ≈ 288
        assert sketch["hot"] <= 900


def test_heavy_hitters_stable_across_parallelism(spark):
    """The query's contract booleans must not depend on how the data is
    partitioned — run the full query under different shuffle widths."""
    fn = all_queries()["agg_heavy_hitters"].fn
    baseline = {
        (r["key"], r["exact_n"], r["in_sketch"], r["est_le_exact"], r["within_bound"])
        for r in fn(spark, SF_ORACLE).collect()
    }
    assert baseline  # hitters exist at oracle scale
    assert all(flag for _, _, *flags in baseline for flag in flags)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = {
            (r["key"], r["exact_n"], r["in_sketch"], r["est_le_exact"], r["within_bound"])
            for r in fn(spark, SF_ORACLE).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert again == baseline


def test_band_keys_are_the_hitters(spark):
    got = {r["key"] for r in all_queries()["agg_heavy_hitters"].fn(spark, SF_ORACLE).collect()}
    assert {"band0", "band1", "band2"} <= got
    # user tail keys must NOT cross the n/T threshold at oracle scale
    assert not any(k.startswith("user") for k in got)


def test_hitter_threshold_exceeds_sketch_bound():
    """The determinism precondition: n/T > n/(k+1) ⇔ T < k+1."""
    from graph_etl_pipeline_spark.queries.aggregates import HH_K, HH_T

    assert HH_T < HH_K + 1
