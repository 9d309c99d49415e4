"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered query on Spark AND its oracle SQL on DuckDB against the
same parquet tables, then compares row count, sorted column names, an
order-insensitive multiset of row values (columns sorted by name — the
driver hashes in that layout, so column-name mismatches fail here too),
AND per-column canonical type classes. The type check is the
driver-equivalence hardening (VERDICT r1 §wrong-1): the driver's value
hash is type-sensitive, so DuckDB returning HUGEINT/decimal128 where
Spark returns bigint must fail HERE, before the driver sees it — Python
``Decimal(5) == 5`` is True, which is exactly how the round-1 gate
missed it.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb
import pyarrow as pa

from graph_etl_pipeline_spark.io import TABLES


def _canon_arrow(t: pa.DataType) -> str:
    """Collapse an Arrow type to the class the driver's hash distinguishes.

    Integer widths are merged (int32 vs int64 both render as Python int);
    decimal128/256 — DuckDB's HUGEINT / uncasted integer SUM — is its own
    class, distinct from both int and float. Timestamp timezone presence
    is ignored (values are normalized to naive before hashing)."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{_canon_arrow(t.value_type)}>"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_struct(t):
        inner = ",".join(f"{f.name}:{_canon_arrow(f.type)}" for f in t)
        return f"struct<{inner}>"
    return str(t)


def _canon_spark(t) -> str:
    """Same canonical classes, from a Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(t, T.DecimalType):
        return "decimal"
    if isinstance(t, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
        return "timestamp"
    if isinstance(t, T.DateType):
        return "date"
    if isinstance(t, T.BooleanType):
        return "bool"
    if isinstance(t, T.ArrayType):
        return f"list<{_canon_spark(t.elementType)}>"
    if isinstance(t, T.StringType):
        return "string"
    if isinstance(t, T.BinaryType):
        return "binary"
    if isinstance(t, T.StructType):
        inner = ",".join(f"{f.name}:{_canon_spark(f.dataType)}" for f in t.fields)
        return f"struct<{inner}>"
    return t.simpleString()


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple], dict[str, str]]:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        # One execution: schema types AND row tuples both come off the
        # Arrow table (running the SQL twice doubled oracle cost).
        tbl = con.execute(sql).arrow()
        cols = list(tbl.schema.names)
        types = {f.name: _canon_arrow(f.type) for f in tbl.schema}
        rows = [tuple(r) for r in zip(*[c.to_pylist() for c in tbl.columns])]
        return cols, rows, types
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
    o_cols, o_rows, o_types = run_oracle(oracle_sql, sf_dir)

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems

    s_types = {f.name: _canon_spark(f.dataType) for f in spark_df.schema.fields}
    drift = {
        c: (s_types[c], o_types[c])
        for c in s_cols
        if s_types[c] != o_types[c]
    }
    if drift:
        problems.append(
            "type drift (spark, oracle): "
            + "; ".join(f"{c}={v}" for c, v in sorted(drift.items()))
        )
    if len(s_rows) != len(o_rows):
        problems.append(f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}")

    sm = _sorted_multiset(s_cols, s_rows)
    om = _sorted_multiset(o_cols, o_rows)
    if sm != om:
        only_s = list((sm - om).items())[:3]
        only_o = list((om - sm).items())[:3]
        problems.append(f"value mismatch: spark-only={only_s} oracle-only={only_o}")
    return problems
