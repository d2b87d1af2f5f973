"""Batch-5 behavioral tests: IVM scatter matrix, triples, weekly
percentile bands."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_ivm_scatter_equals_recompute(spark):
    # base + signed CDF delta must equal a from-scratch scatter over
    # the surviving vectors (the IVM invariant, checked in-process).
    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.plans.series_queries import _fixed_outer

    emb = (
        table(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id") % 7 != 3)
        .select("embedding")
    )
    want = {
        (r.i, r.j): r.g
        for r in _fixed_outer(emb, F.lit(1))
        .groupBy("i", "j")
        .agg(F.sum("prod").cast("long").alias("g"))
        .collect()
    }
    got = {
        (r.i, r.j): r.g_fixed
        for r in QUERIES["ivm_scatter_matrix"](spark, SF_DIR).collect()
    }
    assert got == want


def test_triples_are_subsets_of_pairs(spark):
    pairs = {
        (r.part_a, r.part_b)
        for r in QUERIES["copurchase_pairs_support"](spark, SF_DIR).collect()
    }
    triples = QUERIES["copurchase_triples_support"](spark, SF_DIR).collect()
    # Apriori downward closure: every frequent triple's pairs are
    # frequent at the same min-support.
    for t in triples:
        assert (t.pa, t.pb) in pairs
        assert (t.pa, t.pc) in pairs
        assert (t.pb, t.pc) in pairs


def test_weekly_percentiles_ordered(spark):
    rows = QUERIES["weekly_price_percentiles"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.p50 <= r.p90
        assert r.n_orders >= 1
