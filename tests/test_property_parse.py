"""Property-based test for the target-expansion pipeline (SURVEY §7 risk
list: regex/extraction parity). A pure-Python reference implementation of
the SAME documented semantics is compared against the Spark expression
tree over hundreds of adversarial generated cells — section markers,
sentinels, concatenations, typos, duplicate targets."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graph_etl_pipeline_spark.etl.waste_items import (
    DEFAULT_CONFIG as CFG,
    parse_disposal_targets,
)

ATOMS = (
    list(CFG.streams)
    + list(CFG.known_facilities)
    + ["Restmülltonne", "-", "", "Laut FES: nur Mai", "1 Stück = Sperrmüll",
       "Hinweis beachten", "ab Mai", "x", "Tonne oder Sack", "Gelbe Tonne"]
)


def _normalize_py(s: str) -> str:
    s = s.strip()
    for raw, canonical in CFG.name_map:
        if s == raw:
            return canonical
    return s


def _is_valid_py(s: str) -> bool:
    low = s.lower()
    if len(s) < CFG.min_len:
        return False
    if any(p in low for p in CFG.blocklist):
        return False
    if any(low.startswith(p) for p in CFG.note_prefixes):
        return False
    return " oder " not in low


_ORDERED = sorted(CFG.known_facilities + CFG.streams, key=len, reverse=True)
_PATTERN = re.compile("(" + "|".join(re.escape(p) for p in _ORDERED) + ")")


def parse_py(cell: str) -> list[str]:
    """Pure-Python twin of parse_disposal_targets' documented semantics."""
    out: list[str] = []
    for part in (p.strip() for p in cell.split("\n")):
        if part in ("-", ""):
            continue
        if len(part) > CFG.concat_threshold:
            out.extend(_PATTERN.findall(part))
        else:
            cand = _normalize_py(part)
            if _is_valid_py(cand):
                out.append(cand)
    seen, dedup = set(), []
    for t in (_normalize_py(t) for t in out):
        if t not in seen:
            seen.add(t)
            dedup.append(t)
    return dedup


cells = st.lists(st.sampled_from(ATOMS), min_size=0, max_size=5).map(
    lambda parts: "\n".join(parts)
) | st.lists(st.sampled_from(ATOMS[:8]), min_size=2, max_size=4).map(
    lambda parts: " ".join(parts)  # space-concatenated long cells
)


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(cells, min_size=1, max_size=40))
def test_spark_matches_python_reference(spark, cases):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)], "i int, cell string")
    got = {
        r.i: list(r.targets)
        for r in df.select(
            "i", parse_disposal_targets(F.col("cell")).alias("targets")
        ).collect()
    }
    for i, c in enumerate(cases):
        assert got[i] == parse_py(c), f"cell={c!r}"
