"""Differential property tests for the hand-built sketch family (bloom
bitmap, count-min, sign-bit signatures): a pure-Python replica of the SAME
documented arithmetic is compared against the Spark expression tree over
pseudo-random derandomized inputs (seeded generators, one Spark job per
test — the repo's determinism ethos applied to test cost)."""

from __future__ import annotations

import pyspark.sql.functions as F

from graph_etl_pipeline_spark.queries.aggregates import CMS_MULTS, CMS_W
from graph_etl_pipeline_spark.queries.joins import BLOOM_SEEDS, _bloom_probe
from graph_etl_pipeline_spark.queries.similarity import (
    FIXED_SCALE,
    LONG_MIN,
    _quantize_fixed,
    _sign_sig,
)

MASK64 = (1 << 64) - 1


def _keysets() -> list[tuple[int, list[int]]]:
    """10 seeded pseudo-random key sets with varied density and skew."""
    sets = []
    for seed in range(10):
        n = 20 + 97 * seed
        keys = [((k * 2654435761 + seed * 40503) % 10_000_019) for k in range(n)]
        sets.append((seed, keys))
    return sets


def test_bloom_has_no_false_negatives_on_any_keyset(spark):
    """Membership of every inserted key must survive the bitmap round
    trip for ALL 10 key sets (one build per set, one probe job)."""
    rows = [(sid, k) for sid, keys in _keysets() for k in keys]
    df = spark.createDataFrame(rows, "sid int, key long")

    from graph_etl_pipeline_spark.queries.joins import bloom_bitmap

    n_sets = len(_keysets())
    bitmaps = [
        bloom_bitmap(
            df.filter(F.col("sid") == sid).select("key"), "key"
        ).withColumn("sid", F.lit(sid))
        for sid in range(n_sets)
    ]
    words = bitmaps[0]
    for b in bitmaps[1:]:
        words = words.union(b)
    probed = df.join(words, "sid").withColumn(
        "hit",
        _bloom_probe(F.col("key"), BLOOM_SEEDS[0])
        & _bloom_probe(F.col("key"), BLOOM_SEEDS[1])
        & _bloom_probe(F.col("key"), BLOOM_SEEDS[2]),
    )
    assert probed.filter(~F.col("hit")).count() == 0


def test_countmin_cells_match_python_replica_and_never_undercount(spark):
    """The Spark CMS cell table must equal the pure-Python replica of the
    multiplicative hash exactly, and min-over-rows must be ≥ the true
    count for EVERY key (one-sided error), on a skewed multiset.

    The multiset deliberately includes keys past 2^53/m (where the old
    double-division positions went wrong — ADVICE r6) and near int64
    max, so the exact-integer path is regression-locked for ALL keys."""
    from graph_etl_pipeline_spark.queries.aggregates import CMS_KEY_MASK, _cms_pos

    # Zipf-ish multiset: key k repeated ~ (40 // (k+1)) + 1 times,
    # plus giant keys that break float arithmetic but not ours.
    multiset = [k for k in range(60) for _ in range(40 // (k + 1) + 1)]
    multiset += [2**53 + 7, 2**62 + 12345, (1 << 63) - 1, 2_750_001_337] * 3
    truth: dict[int, int] = {}
    for k in multiset:
        truth[k] = truth.get(k, 0) + 1

    cells_py: dict[tuple[int, int], int] = {}
    for k in multiset:
        for i, m in enumerate(CMS_MULTS):
            pos = (((k & CMS_KEY_MASK) * m) // 1024) % CMS_W
            cells_py[(i, pos)] = cells_py.get((i, pos), 0) + 1

    df = spark.createDataFrame([(k,) for k in multiset], "user_id long")
    cells_spark = {
        (r.i, r.pos): r.c
        for r in df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _cms_pos(F.col("user_id"), m).alias("pos"),
                        )
                        for i, m in enumerate(CMS_MULTS)
                    ]
                )
            ).alias("ip")
        )
        .groupBy(F.col("ip.i").alias("i"), F.col("ip.pos").alias("pos"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert cells_spark == cells_py
    for k, true_n in truth.items():
        est = min(
            cells_py[(i, (((k & CMS_KEY_MASK) * m) // 1024) % CMS_W)]
            for i, m in enumerate(CMS_MULTS)
        )
        assert est >= true_n, (k, est, true_n)


def test_sign_signature_matches_python_bit_packing(spark):
    """_sign_sig must equal the plain Python sign-packing (including the
    LONG_MIN encoding of bit 63) for 200 seeded pseudo-random vectors."""
    vecs = []
    for v in range(200):
        vec = [
            (((v * 64 + i) * 2654435761) % 2001 - 1000) / 1000.0
            for i in range(64)
        ]
        vecs.append((v, vec))

    def py_sig(vec: list[float]) -> int:
        q = [int((x * FIXED_SCALE + 0.5) // 1) for x in vec]
        u = 0
        for i, x in enumerate(q):
            if x >= 0:
                u |= 1 << i
        return u - (1 << 64) if u & (1 << 63) else u

    df = spark.createDataFrame(
        [(v, vec, 0) for v, vec in vecs], "vec_id long, embedding array<float>, label int"
    )
    got = {
        r.vec_id: r.sig
        for r in _quantize_fixed(df)
        .select("vec_id", _sign_sig(F.col("qe")).alias("sig"))
        .collect()
    }
    for v, vec in vecs:
        # quantization happens on FLOAT-cast values in Spark; replicate
        fvec = [float(__import__("struct").unpack("f", __import__("struct").pack("f", x))[0]) for x in vec]
        assert got[v] == py_sig(fvec), v
    assert LONG_MIN == -(1 << 63)


def test_merkle_checksum_matches_python_replica(spark, tmp_path):
    """Pure-Python replica of the anti-entropy digest arithmetic
    (canonical rendering -> md5 -> key bucket -> lane sums + min/max)
    over a seeded pseudo-random orders fixture: every bucket row the
    operator emits must match the replica bit for bit."""
    import hashlib
    import math
    from collections import defaultdict

    from graph_etl_pipeline_spark.queries.quality import (
        MERKLE_BUCKETS, dq_merkle_checksum,
    )

    rows = []
    for k in range(1, 120):
        price = ((k * 2654435761) % 999_983) / 100.0
        rows.append(
            (
                k,
                1000 + (k * 40503) % 77,
                ["O", "F", "P"][k % 3],
                price,
                "199%d-0%d-1%d 0%d:00:00" % (k % 7 + 2, k % 9 + 1, k % 9, k % 10),
                ["1-URGENT", "3-MEDIUM", "5-LOW"][k % 3],
            )
        )
    sf = str(tmp_path / "merkle_prop")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp")).write.parquet(
        f"{sf}/orders.parquet"
    )

    expect = defaultdict(lambda: [0, 0, 0, None, None])  # n, s1, s2, mn, mx
    for k, ck, st, price, ts, prio in rows:
        cents = math.floor(price * 100 + 0.5)
        canon = "\x1f".join([str(k), str(ck), st, str(cents), ts, prio])
        digest = hashlib.md5(canon.encode()).hexdigest()
        b = int(hashlib.md5(f"bk:{k}".encode()).hexdigest()[:8], 16) % MERKLE_BUCKETS
        e = expect[b]
        e[0] += 1
        e[1] += int(digest[:8], 16)
        e[2] += int(digest[8:16], 16)
        e[3] = digest if e[3] is None else min(e[3], digest)
        e[4] = digest if e[4] is None else max(e[4], digest)

    got = {r.bucket: r for r in dq_merkle_checksum(spark, sf).collect()}
    assert set(got) == set(expect)
    for b, (n, s1, s2, mn, mx) in expect.items():
        r = got[b]
        assert (r.n_rows, r.sum_h1, r.sum_h2, r.min_digest, r.max_digest) == (
            n, s1, s2, mn, mx,
        ), f"bucket {b}"
