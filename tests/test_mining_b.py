"""Behavioral tests for batch B: phrase positional match, activity
streaks, A/B lift, GDPR cascade erasure."""

from __future__ import annotations

import datetime
import hashlib

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.operators.fulltext import phrase_occurrences
from dss_nlp_ingestion_spark.operators.relational import consecutive_day_streaks
from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_phrase_occurrences_counts_overlaps(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),        # "a b" at pos 0 and 2
            (2, "a b"),              # one occurrence
            (3, "b a b"),            # one at pos 1
            (4, "a a a"),            # zero
            (5, "x y z"),            # zero
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_occurrences(docs, "doc_id", "text", ("a", "b")).collect()
    }
    assert got == {(1, 2), (2, 1), (3, 1)}


def test_phrase_occurrences_three_terms(spark):
    docs = spark.createDataFrame(
        [(1, "u v w u v w u v"), (2, "w v u")], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.n_occurrences)
        for r in phrase_occurrences(docs, "doc_id", "text", ("u", "v", "w")).collect()
    }
    assert got == {(1, 2)}


def test_consecutive_day_streaks_crafted(spark):
    def d(day):
        return datetime.datetime(2024, 1, day, 12, 0, 0)

    ev = spark.createDataFrame(
        [
            # user 1: days 1,2,3 then 5 then 10,11 -> streaks 3/1/2
            (1, d(1)), (1, d(1)), (1, d(2)), (1, d(3)), (1, d(5)),
            (1, d(10)), (1, d(11)),
            # user 2: one day
            (2, d(7)),
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r.user_id, r.n_streaks, r.max_streak, r.n_active_days)
        for r in consecutive_day_streaks(ev, "user_id", "ts").collect()
    }
    assert got == {(1, 3, 3, 6), (2, 1, 1, 1)}


def test_ab_test_invariants(spark):
    row = QUERIES["ab_test_lift"](spark, SF_DIR).collect()[0]
    ev_users = (
        QUERIES["activity_streaks"](spark, SF_DIR).count()
    )  # distinct users via another query's output
    assert row.a_conv + row.a_rest + row.b_conv + row.b_rest == ev_users
    assert row.chi2 is None or row.chi2 >= 0.0
    # hash split actually splits (both arms populated at sf0.001)
    assert row.a_conv + row.a_rest > 0 and row.b_conv + row.b_rest > 0


def test_gdpr_erasure_is_complete(spark):
    out = QUERIES["gdpr_cascade_delete"](spark, SF_DIR).collect()

    def erased(uid: int) -> bool:
        h = hashlib.sha256(f"gdpr:{uid}".encode()).hexdigest()
        return int(h[:13], 16) % 5 == 0

    assert len(out) > 0
    for r in out:
        # nobody in the erased set survives in EITHER table
        assert not erased(r.user_id)
        # profile aggregate agrees with re-aggregated activity
        assert r.activity_rows == r.n_events
    # and at least one user was actually erased at this sf
    survivors = {r.user_id for r in out}
    all_users = {
        r.user_id
        for r in QUERIES["activity_streaks"](spark, SF_DIR).select("user_id").collect()
    }
    assert any(erased(u) for u in all_users - survivors) or (all_users == survivors)
