"""Batch-7 behavioral tests: stickiness, IQR fences, burstiness."""

from __future__ import annotations

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_stickiness_bounded(spark):
    rows = QUERIES["dau_wau_stickiness"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r.stickiness <= 1.0
        assert r.dau <= r.wau


def test_iqr_fences_ordered(spark):
    rows = QUERIES["iqr_outlier_orders"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.q1 <= r.q3
        assert r.n_high_outliers <= r.n_orders


def test_burstiness_positive(spark):
    rows = QUERIES["event_burstiness"](spark, SF_DIR).collect()
    assert {r.event_type for r in rows} == {
        "signup", "error", "click", "view", "purchase"
    }
    for r in rows:
        assert r.fano >= 0.0
