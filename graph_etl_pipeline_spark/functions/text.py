"""Text tokenization / shingling expressions (LLM-pipeline operators).

All built-in higher-order array functions — codegen'd JVM expressions, no
Python in the hot path. The SQL twins of these expressions live next to
each query's oracle so both engines compute identical values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_tokens(c: Column | str) -> Column:
    """lowercase, collapse whitespace, trim, split — the canonical token
    list. The trim matters: without it, leading/trailing whitespace mints
    empty-string tokens that inflate counts and pollute shingles."""
    c = F.col(c) if isinstance(c, str) else c
    return F.split(F.trim(F.regexp_replace(F.lower(c), r"\s+", " ")), " ")


def shingles(toks: Column, k: int = 3) -> Column:
    """Distinct k-word shingles; short docs fall back to one whole-doc
    shingle so every document has a non-empty set.

    Built by zipping k shifted copies of the token array (k array slices
    total per row) instead of one slice per shingle position (n slices) —
    ~7× faster on the exploding path, identical output. arrays_zip over
    anonymous expressions names its struct fields "0".."k-1"."""
    # column-valued slice length: a literal cap would silently truncate
    # (and corrupt shingles for) documents longer than the cap
    shifted = [toks] + [
        F.slice(toks, i + 1, F.greatest(F.size(toks) - i, F.lit(1)))
        for i in range(1, k)
    ]
    zipped = F.arrays_zip(*shifted)
    n = F.size(toks)
    window = F.slice(zipped, 1, F.greatest(n - (k - 1), F.lit(0)))
    make = F.array_distinct(
        F.transform(
            window,
            lambda s: F.concat_ws(" ", *[s.getField(str(i)) for i in range(k)]),
        )
    )
    return F.when(n >= k, make).otherwise(F.array(F.concat_ws(" ", toks)))


# SQL twins (DuckDB dialect), used to build oracle strings.
SQL_TOKS = r"string_split(trim(regexp_replace(lower({col}), '\s+', ' ', 'g')), ' ')"


def sql_shingles(toks: str, k: int = 3) -> str:
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct([array_to_string({toks}[i:i+{k - 1}], ' ') "
        f"for i in generate_series(1, len({toks})-{k - 1})]) "
        f"ELSE [array_to_string({toks}, ' ')] END"
    )
