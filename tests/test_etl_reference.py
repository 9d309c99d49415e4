"""Reference-parity tests: the engine's waste-item/facility ETL must
reproduce the reference's behavior on its hardcoded messy-input cases
(FIXTURES.md §A; reference behaviors cited per case)."""

from __future__ import annotations

import json
import os

import pytest

from graph_etl_pipeline_spark.etl.facilities import import_facilities, load_facilities
from graph_etl_pipeline_spark.etl.waste_items import (
    import_waste_items,
    load_waste_items,
)

CSV_ROWS = [
    # header per etl_implementation.md:56-62
    ("Abfallart", "Entsorgungsweg", "Adresse", "Öffnungszeiten", "Kontakt"),
    ("A", "", "", "", ""),  # section marker → dropped (waste_items.py:240-248)
    ("", "Restabfalltonne", "", "", ""),  # blank name → dropped (:269-271)
    ("Altbatterien", "-", "", "", ""),  # '-' sentinel → zero targets (:134-135)
    ("Bananenschale", "Biotonne", "", "", ""),  # simple stream route
    ("Farbeimer", "Wertstoffhof Nord\nSchadstoffsammlung", "", "", ""),  # multiline (:139-141)
    (
        "Elektrozahnbürste",
        "Wertstoffhof Nord Wertstoffhof West Schadstoffsammlung",
        "", "", "",
    ),  # concat >30 chars → extraction (:154-159,174-237)
    ("Gartenabfall", "Laut FES: nur Mai-Oktober", "", "", ""),  # note row → rejected (:72-120)
    ("Sperrmüllteil", "1 Stück = Sperrmüll", "", "", ""),  # blocklist ' = '/'stück'
    ("Restlack", "Restmülltonne", "", "", ""),  # typo synonym → Restabfalltonne (:45-58)
    ("Duplikat", "Biotonne\nBiotonne", "", "", ""),  # in-cell dup → dedup (:171)
    ("Unbekannt", "Wertstoffhof Süd", "", "", ""),  # unknown facility → unmatched warning (:414-419)
]

FACILITIES_JSON = {
    "uuid-1": [
        {
            "name": "Wertstoffhof Nord",
            "address": "Max-Holder-Str. 29",
            "opening_hours": "",
            "contact": "",
            "additional_info": "",
            "link": "",
        }
    ],
    "uuid-2": [
        {
            # same name, complementary fields → merge-most-complete (:59-76)
            "name": "Wertstoffhof Nord",
            "address": "SHOULD NOT WIN",
            "opening_hours": "Mo-Sa 8-16",
            "contact": "069-1234",
            "additional_info": "",
            "link": "",
        },
        {
            "name": "Schadstoffsammlung",
            "address": "Mobil",
            "opening_hours": "",
            "contact": "",
            "additional_info": "",
            "link": "",
        },
        {"name": "", "address": "dropped", "opening_hours": "", "contact": "",
         "additional_info": "", "link": ""},  # empty name → dropped (:62-64)
    ],
    "uuid-3": [
        {
            "name": "Wertstoffhof West",
            "address": "", "opening_hours": "", "contact": "",
            "additional_info": "", "link": "",
        }
    ],
}


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_fixtures")
    csv_path = os.path.join(d, "abfall_abc.csv")
    with open(csv_path, "w", encoding="utf-8") as f:
        for row in CSV_ROWS:
            f.write(",".join('"' + c.replace('"', '""') + '"' for c in row) + "\n")
    json_path = os.path.join(d, "disposal_map.json")
    with open(json_path, "w", encoding="utf-8") as f:
        json.dump(FACILITIES_JSON, f, ensure_ascii=False)
    return csv_path, json_path


def _targets(spark, csv_path):
    rows = load_waste_items(spark, csv_path).collect()
    return {r.name: sorted(r.disposal_targets) for r in rows}


def test_filters_and_expansion(spark, fixture_paths):
    csv_path, _ = fixture_paths
    t = _targets(spark, csv_path)
    assert "A" not in t and "" not in t  # section marker + blank dropped
    assert t["Altbatterien"] == []  # '-' sentinel
    assert t["Bananenschale"] == ["Biotonne"]
    assert t["Farbeimer"] == ["Schadstoffsammlung", "Wertstoffhof Nord"]  # multiline
    assert t["Elektrozahnbürste"] == [
        "Schadstoffsammlung", "Wertstoffhof Nord", "Wertstoffhof West"
    ]  # concat extraction
    assert t["Gartenabfall"] == []  # note prefix 'laut'
    assert t["Sperrmüllteil"] == []  # blocklist
    assert t["Restlack"] == ["Restabfalltonne"]  # typo normalization
    assert t["Duplikat"] == ["Biotonne"]  # in-cell dedup


def test_facility_merge_most_complete(spark, fixture_paths):
    _, json_path = fixture_paths
    facs = {r["name"]: r.asDict() for r in load_facilities(spark, json_path).collect()}
    assert set(facs) == {"Wertstoffhof Nord", "Schadstoffsammlung", "Wertstoffhof West"}
    nord = facs["Wertstoffhof Nord"]
    # first non-empty wins; later record only fills gaps
    assert nord["address"] == "Max-Holder-Str. 29"
    assert nord["opening_hours"] == "Mo-Sa 8-16"
    assert nord["contact"] == "069-1234"


def test_import_stats_and_idempotency(spark, fixture_paths):
    csv_path, json_path = fixture_paths
    facilities, fstats = import_facilities(spark, json_path)
    assert fstats.facilities_loaded == 3

    items, edges, stats = import_waste_items(spark, csv_path, facilities)
    assert stats.unmatched_facilities == 1  # 'Wertstoffhof Süd' (:414-419)
    assert stats.streams_needed == 2  # Biotonne, Restabfalltonne

    n_items, n_edges = items.count(), edges.count()
    # DISPOSED_IN: Bananenschale→Bio, Restlack→Rest, Duplikat→Bio = 3
    assert edges.filter("rel_type = 'DISPOSED_IN'").count() == 3
    # DISPOSED_AT: Farbeimer×2 + Elektrozahnbürste×3 = 5 (Süd unmatched)
    assert edges.filter("rel_type = 'DISPOSED_AT'").count() == 5

    # re-run over the merged state: identical counts (reference CLAUDE.md:80)
    items2, edges2, _ = import_waste_items(
        spark, csv_path, facilities, existing_items=items, existing_edges=edges
    )
    assert items2.count() == n_items
    assert edges2.count() == n_edges


def test_facility_prefer_nonempty_upsert(spark, fixture_paths):
    _, json_path = fixture_paths
    first, _ = import_facilities(spark, json_path)
    # re-import over existing state → idempotent, empties never clobber
    second, _ = import_facilities(spark, json_path, existing=first)
    a = {r["name"]: r.asDict() for r in first.collect()}
    b = {r["name"]: r.asDict() for r in second.collect()}
    assert a == b


def test_xlsx_and_csv_ingest_agree(spark, fixture_paths, tmp_path):
    """The reference's real input is Abfall_ABC.xlsx (README.md:124); its
    code reads a CSV export. Both ingest paths must yield IDENTICAL rows
    over the same fixture content — including the multiline cell, the '-'
    sentinel, and the umlaut names — so a user can feed either form."""
    from graph_etl_pipeline_spark.etl.waste_items import load_waste_items_xlsx
    from graph_etl_pipeline_spark.operators.xlsx import write_xlsx

    csv_path, _ = fixture_paths
    xlsx_path = str(tmp_path / "abfall_abc.xlsx")
    write_xlsx(
        xlsx_path,
        {"Abfall_ABC": (list(CSV_ROWS[0]), [tuple(r) for r in CSV_ROWS[1:]])},
    )
    via_csv = {
        (r.name, tuple(r.disposal_targets))
        for r in load_waste_items(spark, csv_path).collect()
    }
    via_xlsx = {
        (r.name, tuple(r.disposal_targets))
        for r in load_waste_items_xlsx(spark, xlsx_path).collect()
    }
    assert via_csv == via_xlsx and via_csv, via_xlsx ^ via_csv
