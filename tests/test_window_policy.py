"""The mechanized driver-window policy (VERDICT r9 #4): CORE_ORDER must
be exactly what window_policy.derive_window produces from the
CORRECTNESS history, and the derivation must reproduce the r9 window —
proving the generator would have made the same rotation decisions the
hand-kept lists did, so the r7-class rotation mistake (a declared name
silently left out of the window) is structurally impossible."""

from __future__ import annotations

import json
import os

from graph_etl_pipeline_spark import window_policy as wp
from graph_etl_pipeline_spark.registry import (
    CORE_ORDER, CORE_ORDER_THROUGH_ROUND, DRIVER_CAP, all_queries,
    registration_order,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_core_order_matches_derivation():
    """registry.CORE_ORDER is a generated artifact: any hand edit (or a
    new registration without regenerating) diverges from the derivation
    and fails here. The derivation replays over EXACTLY the history
    rounds stamped next to the literal (CORE_ORDER_THROUGH_ROUND), so
    the driver writing CORRECTNESS_r{N+1}.json mid-round does not flip
    this red (the r10 structural failure, VERDICT r10 #1) — the stamp
    advances when scripts/gen_window.py reruns as the mechanical first
    commit of the next round."""
    derived = wp.derive_window(
        registration_order(),
        wp.load_history(REPO, through_round=CORE_ORDER_THROUGH_ROUND),
        changed=wp.CHANGED_SINCE_GREEN,
    )
    assert CORE_ORDER == derived
    assert len(CORE_ORDER) == DRIVER_CAP


def test_stamp_not_stale_beyond_one_round():
    """The stamp may trail the newest CORRECTNESS file by at most one
    round (the mid-round state after the driver lands r{N+1}); two or
    more means someone skipped the mechanical regeneration commit."""
    assert wp.latest_round(REPO) - CORE_ORDER_THROUGH_ROUND <= 1


def test_derivation_reproduces_r9_window():
    """Replaying the derivation with only the r1–r8 history must select
    the same 50 names the hand-declared r9 window checked (set equality:
    the driver's gate is membership in the first 50; intra-window order
    carried no policy meaning in the hand-kept era)."""
    with open(os.path.join(REPO, "CORRECTNESS_r09.json")) as f:
        r9_keys = set(json.load(f))
    assert len(r9_keys) == DRIVER_CAP
    # Registered-at-r9-window-time: everything except the two operators
    # added in the r9 end-of-round snapshot commit AFTER the window was
    # cut (VERDICT r9 "what's wrong" #1) and anything registered in r10+.
    post_window = {"graph_harmonic_centrality", "win_attribution_multitouch"}
    hist9 = wp.load_history(REPO, through_round=9)  # names known by r9 end
    hist8 = wp.load_history(REPO, through_round=8)
    registered_r9 = [
        n for n in registration_order() if n in hist9 and n not in post_window
    ]
    derived = wp.derive_window(
        registered_r9,
        hist8,
        # r9's declared tier-2: the two implementations changed after
        # earning earlier green rows (ADVICE r8 fixes). agg_exact_moments
        # was red in r8 so it lands in tier 1 regardless.
        changed=frozenset({"agg_exact_moments", "src_pdf_scan"}),
    )
    assert set(derived) == r9_keys


def test_survey_rows_in_window_or_proven():
    """The rotation invariant the old hand-kept ROTATED_OUT list existed
    to enforce: every SURVEY §2-declared row is either inside the current
    driver window or already holds a green driver row in history — a §2
    row may rotate out only after it has been proven. Rotated-out rows
    must also keep a DuckDB oracle so the local parity replica still
    checks them every round."""
    names = list(all_queries())
    history = wp.load_history(REPO)
    window = set(names[:DRIVER_CAP])
    unproven = {
        n for n in wp.SURVEY_DECLARED
        if n not in window and history.get(n, 0) == 0
    }
    assert not unproven, f"SURVEY rows neither windowed nor proven: {unproven}"
    specs = all_queries()
    out = wp.rotated_out(names, names[:DRIVER_CAP], history)
    missing_oracle = {n for n in out if specs[n].oracle is None}
    assert not missing_oracle, missing_oracle


def test_never_green_leads_window():
    """Tier-1 guarantee: any registered query with no green driver row
    ever must sit INSIDE the window (it can never earn one otherwise).
    This is the exact failure mode of the two r9 snapshot operators —
    registered but outside the list, hence uncheckable."""
    history = wp.load_history(REPO)
    names = list(all_queries())
    window = set(names[:DRIVER_CAP])
    stranded = [n for n in names if history.get(n, 0) == 0 and n not in window]
    assert not stranded, f"never-checked queries stranded outside window: {stranded}"
