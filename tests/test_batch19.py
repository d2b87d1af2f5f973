"""Batch-19 tests: WoW growth, cent-exact allocation."""

from __future__ import annotations

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_wow_growth_null_only_on_first_week(spark):
    rows = QUERIES["wow_revenue_growth"](spark, SF_DIR).collect()
    assert rows
    first_wk = {}
    for r in rows:
        first_wk.setdefault(r.seg, r.wk)
        first_wk[r.seg] = min(first_wk[r.seg], r.wk)
    for r in rows:
        if r.wk == first_wk[r.seg]:
            assert r.wow_growth is None
        else:
            assert r.wow_growth is not None
            assert r.wow_growth > -1.0  # revenue can't drop below zero


def test_allocation_invariant_holds_everywhere(spark):
    r = QUERIES["cent_exact_allocation"](spark, SF_DIR).collect()[0]
    # the whole point: every order's cents sum exactly to its total
    assert r.n_exact == r.n_orders
    assert r.n_orders > 0
    assert r.n_lines >= r.n_orders
