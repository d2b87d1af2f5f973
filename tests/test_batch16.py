"""Batch-16 tests: Benford digits, FD audit, freshness."""

from __future__ import annotations

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_benford_digits_cover_1_to_9(spark):
    rows = QUERIES["benford_first_digit_counts"](spark, SF_DIR).collect()
    digits = {r.first_digit for r in rows}
    assert digits <= set(range(1, 10))
    assert sum(r.n for r in rows) > 0


def test_fd_audit_real_fd_has_zero_violations(spark):
    rows = {r.fd: r for r in QUERIES["fd_violation_audit"](spark, SF_DIR).collect()}
    assert rows["n_nationkey->n_regionkey"].violations == 0
    assert rows["o_custkey->o_orderpriority"].violations >= 0
    for r in rows.values():
        assert r.n_pairs >= r.n_lhs


def test_freshness_head_source_is_fresh(spark):
    rows = QUERIES["freshness_report"](spark, SF_DIR).collect()
    assert rows
    # at least one source carries the head watermark (staleness 0)
    assert min(r.staleness_hours for r in rows) == 0
    for r in rows:
        if r.sla_breach:
            assert r.staleness_hours >= 24
        if r.staleness_hours >= 25:
            assert r.sla_breach == 1
