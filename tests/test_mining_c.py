"""Behavioral tests for batch C: skyline, co-purchase itemsets,
CUSUM drift, readability."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.text import readability_features
from dss_nlp_ingestion_spark.operators.relational import cusum_scaled_deviation
from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_skyline_matches_bruteforce(spark):
    got = {
        r.o_orderkey for r in QUERIES["skyline_orders"](spark, SF_DIR).collect()
    }
    base = [
        (r.o_orderkey, r.o_orderdate, r.o_totalprice)
        for r in table(spark, SF_DIR, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .collect()
    ]

    def dominated(a):
        return any(
            b[1] <= a[1] and b[2] >= a[2] and (b[1] < a[1] or b[2] > a[2])
            for b in base
            if b[0] != a[0]
        )

    expect = {k for (k, d, p) in base if not dominated((k, d, p))}
    assert got == expect and len(got) > 0 and len(got) < len(base)


def test_copurchase_pairs_invariants(spark):
    out = QUERIES["copurchase_pairs_support"](spark, SF_DIR).collect()
    for r in out:
        assert r.part_a < r.part_b and r.support >= 2


def test_cusum_flags_planted_drift(spark):
    # stable rate then a sustained tripling: flagged hours must exist
    # and must start only after the drift begins.
    rows = []
    base = datetime.datetime(2024, 1, 1)
    eid = 0
    for h in range(200):
        for i in range(10 if h < 100 else 30):
            rows.append((eid, base + datetime.timedelta(hours=h, seconds=i)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    s = cusum_scaled_deviation(ev, "ts")
    flagged = s.filter(
        F.abs(F.col("s_scaled")) * 10 > F.col("n_hours") * F.col("total")
    )
    n = flagged.count()
    assert n > 0
    # |S| peaks exactly at the change point (the CUSUM estimate of
    # the change location), and the flagged hours form one region
    # around it.
    peak = (
        s.orderBy(F.abs(F.col("s_scaled")).desc(), F.col("hour"))
        .limit(1)
        .collect()[0]
        .hour
    )
    assert peak == base + datetime.timedelta(hours=99)
    # final CUSUM returns to ~0 by construction of the scaled sum
    last = s.orderBy(F.col("hour").desc()).limit(1).collect()[0]
    assert last.s_scaled == 0


def test_readability_features_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a a a a a a a"),
            (2, "extraordinarily sophisticated multisyllabic vocabularies"),
            (3, "One line. Two lines! Three lines? Done."),
            (4, "   "),  # blank: dropped
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in readability_features(docs, "doc_id", "text").collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_words == 10 and rows[1].n_syllables == 10
    assert rows[3].n_sentences == 4
    # syllables-per-word orders the flesch scores
    assert rows[1].flesch_raw > rows[2].flesch_raw
