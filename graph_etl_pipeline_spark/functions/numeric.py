"""Deterministic numeric aggregation helpers.

Double-precision sums are order-dependent, and Spark's partition-parallel
aggregation visits rows in a different order than a single-threaded oracle.
Casting to decimal first makes the sum EXACT (order-independent), so results
hash identically across engines and across cluster sizes — this matters for
correctness auditing at 100 TB exactly as much as at sf0.01.

Scale-6 is tie-free: no IEEE double lies exactly halfway between two
6-decimal values (a tie would need the value to be odd/(2*10^6), whose
denominator contains 5^6 and hence is not representable in binary), so
Spark's HALF_UP and DuckDB's rounding agree on every input.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(c: Column | str, typ: str = DEC) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(typ)


def dsum(c: Column | str, alias: str | None = None) -> Column:
    """Exact sum of a double column, returned as double."""
    out = F.sum(dec(c)).cast("double")
    return out.alias(alias) if alias else out


def davg(c: Column | str, alias: str | None = None) -> Column:
    """Deterministic mean: exact decimal sum, then one double division."""
    c = F.col(c) if isinstance(c, str) else c
    out = F.sum(dec(c)).cast("double") / F.count(c).cast("double")
    return out.alias(alias) if alias else out
