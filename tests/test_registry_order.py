"""Pin the contract-registry order against the driver's 50-entry check cap.

The driver records correctness rows for exactly the first 50 entries of
``queries()`` in dict-insertion order (VERDICT r03 proved this: the
CORRECTNESS_r03.json key order equals registry insertion order, cut at 50;
r02 and r03 each silently left a tail of queries driver-untested).  These
tests make that failure mode impossible to reintroduce: the first-50 window
must equal the explicit ``DRIVER_PRIORITY`` list, so any late registration
that would displace a priority query fails CI instead of silently shrinking
driver coverage.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

DRIVER_CAP = 50


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", REPO / "__spark_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("__spark_entry__", mod)
    spec.loader.exec_module(mod)
    return mod


def test_driver_priority_is_exactly_the_check_window():
    mod = _entry_module()
    assert len(mod.DRIVER_PRIORITY) == DRIVER_CAP, (
        f"DRIVER_PRIORITY must hold exactly {DRIVER_CAP} names "
        f"(the driver's per-round check cap), got {len(mod.DRIVER_PRIORITY)}"
    )
    assert len(set(mod.DRIVER_PRIORITY)) == DRIVER_CAP, "duplicate names in DRIVER_PRIORITY"


def test_registry_first_50_equals_driver_priority():
    mod = _entry_module()
    qs = mod.queries()
    first = list(qs)[:DRIVER_CAP]
    assert first == mod.DRIVER_PRIORITY, (
        "the first 50 registry entries drifted from DRIVER_PRIORITY — a new "
        "registration is displacing a query out of the driver's check window:\n"
        + "\n".join(
            f"  pos {i}: got {g!r}, want {w!r}"
            for i, (g, w) in enumerate(zip(first, mod.DRIVER_PRIORITY))
            if g != w
        )
    )


def test_every_query_has_oracle_and_order_matches():
    mod = _entry_module()
    qs, os_ = mod.queries(), mod.oracle_sql()
    missing = [k for k in qs if k not in os_]
    assert not missing, f"queries without oracle_sql entries: {missing}"
    # oracle dict must present the same ordering so a driver iterating either
    # dict sees the same 50-entry window
    assert list(os_)[:DRIVER_CAP] == list(qs)[:DRIVER_CAP]


def test_never_driver_tested_queries_lead_the_window():
    """The 11 queries without any driver row through r04 (positions 72-79 +
    85-87 of the r4 registry, local-mirror-only) must sit at the head of the
    r5 window so CORRECTNESS_r05 finally records them."""
    mod = _entry_module()
    never_tested = [
        "session_windows_batch",
        "corpus_length_percentiles",
        "j_json_functions",
        "docs_topn_per_source",
        "events_by_segment",
        "events_value_histogram",
        "events_pivot_by_type",
        "events_daily_windows",
        "q8_market_share",
        "q15_top_supplier",
        "q17_small_qty_revenue",
    ]
    head = list(mod.queries())[: len(never_tested)]
    assert head == never_tested


def test_q7_fix_stays_in_window():
    """q7 was the one red driver row in r4 (round-at-boundary on double
    sums); the exact-decimal fix must get a driver row this round."""
    mod = _entry_module()
    window = mod.DRIVER_PRIORITY
    assert "q7_nation_volume" in window
    # every query the decimal-sum convention re-planned re-validates too
    for name in ["q10_returned_revenue", "q14_promo_share", "q19_disjunctive",
                 "q22_idle_customers", "q_rollup_revenue", "q_cube_revenue",
                 "q_window_frames", "e1_merge_records"]:
        assert name in window, name
