"""Batch-20 tests: post-stratified estimate, capture-recapture."""

from __future__ import annotations

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_post_stratified_estimate_near_truth(spark):
    rows = QUERIES["post_stratified_estimate"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n_sampled <= r.big_n
        true_total = r.true_cents / 100.0
        # unbiased estimator; tolerate sampling noise at tiny sf
        assert abs(r.estimated_total - true_total) < 0.5 * true_total


def test_capture_recapture_within_2x(spark):
    rows = QUERIES["capture_recapture_estimate"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.overlap <= min(r.na, r.nb)
    assert r.n_hat > 0
    if r.n_true >= 100:  # the 2x band needs a non-trivial population
        assert r.n_true / 2 < r.n_hat < r.n_true * 2
