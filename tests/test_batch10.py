"""Batch-10 tests: vocab ids, negative sampling, RFM, weighted median."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_vocab_ids_dense_and_sorted(spark):
    rows = QUERIES["vocab_dense_ids"](spark, SF_DIR).collect()
    assert rows
    by_id = sorted(rows, key=lambda r: r.token_id)
    assert [r.token_id for r in by_id] == list(range(1, len(rows) + 1))
    terms = [r.term for r in by_id]
    assert terms == sorted(terms)


def test_negative_sampling_weights_are_c34(spark):
    rows = QUERIES["negative_sampling_table"](spark, SF_DIR).collect()
    assert rows
    for r in rows[:50]:
        assert r.weight == int(float(r.term_count) ** 0.75 // 1) or (
            # float pow vs nested sqrt may differ at exact-integer
            # boundaries; the nested-sqrt form is the contract
            abs(r.weight - float(r.term_count) ** 0.75) < 1.0
        )
    cum = 0
    for r in sorted(rows, key=lambda r: r.term):
        cum += r.weight
        assert r.cum_weight == cum


def test_rfm_scores_in_range(spark):
    rows = QUERIES["rfm_user_segments"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.r_score <= 4
        assert 1 <= r.f_score <= 4
        assert 1 <= r.m_score <= 4
    # quartiles are balanced within one step
    from collections import Counter

    c = Counter(r.r_score for r in rows)
    assert max(c.values()) - min(c.values()) <= 1


def test_weighted_median_splits_mass(spark):
    from dss_nlp_ingestion_spark.catalog import table

    r = QUERIES["weighted_median_price"](spark, SF_DIR).collect()[0]
    li = table(spark, SF_DIR, "lineitem")
    below = (
        li.filter(F.col("l_extendedprice") < r.weighted_median)
        .agg(F.sum("l_quantity"))
        .collect()[0][0]
        or 0
    )
    at_or_below = (
        li.filter(F.col("l_extendedprice") <= r.weighted_median)
        .agg(F.sum("l_quantity"))
        .collect()[0][0]
    )
    assert below * 2 < r.total_weight <= at_or_below * 2