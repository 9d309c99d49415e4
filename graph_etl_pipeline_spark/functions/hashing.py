"""Hash-based key and signature functions.

Engine analogue of the reference's deterministic surrogate keys
(reference: src/etl/waste_items.py:61-63, src/etl/facilities.py:36-38 —
sha256(name) truncated to 16 hex chars). All built-in JVM expressions; no
Python UDFs. md5-based min-hashing keeps signatures portable across
engines (DuckDB has md5 too), which keeps the dedup operators
oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def uid_hash(c: Column | str, length: int = 16) -> Column:
    """Deterministic surrogate uid: sha256 hex truncated to `length` chars."""
    c = F.col(c) if isinstance(c, str) else c
    return F.sha2(c.cast("string"), 256).substr(1, length)

