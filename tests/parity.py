"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark AND its oracle SQL on DuckDB against the
same parquet tables, then compares row count, sorted column names, and an
order-insensitive multiset of row values (columns sorted by name — the
driver hashes in that layout, so column-name mismatches fail here too).
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb

from graph_etl_pipeline_spark.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _sorted_multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm(r[i]) for i in order) for r in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    sm = _sorted_multiset(s_cols, s_rows)
    om = _sorted_multiset(o_cols, o_rows)
    if sm != om:
        only_s = list((sm - om).items())[:3]
        only_o = list((om - sm).items())[:3]
        problems.append(f"value mismatch: spark-only={only_s} oracle-only={only_o}")
    return problems
