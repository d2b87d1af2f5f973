"""Layout-scale operators: bucketed zero-exchange joins, sort-free
dense ID assignment, interval coalescing, hourly ACF."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _fmt(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_bucketed_join_has_no_exchange(spark):
    from dss_nlp_ingestion_spark.plans.scale_queries import bucketed_join_tables

    cust, orders = bucketed_join_tables(spark, SF_DIR)
    j = cust.hint("merge").join(
        orders.hint("merge"), cust["c_custkey"] == orders["o_custkey"]
    )
    plan = _fmt(j, spark)
    assert "SortMergeJoin" in plan
    # The whole point of the layout: the join itself moves no rows.
    assert "Exchange" not in plan
    assert "SelectedBucketsCount" in plan  # both scans are bucket-aware


def test_dense_ids_no_single_partition_collapse(spark):
    plan = _fmt(QUERIES["dense_ids_orders"](spark, SF_DIR), spark)
    # Parallel range exchange, never the one-task global window.
    assert "rangepartitioning" in plan
    assert "Exchange SinglePartition" not in plan
    assert "], true, 0" not in plan  # no global sort node


def test_dense_ids_contiguous_crafted(spark):
    from dss_nlp_ingestion_spark.operators.relational import dense_ids_by_key

    rows = [(k,) for k in (42, 7, 99, 1, 58, 23, 77, 3, 1000, -5)]
    df = spark.createDataFrame(rows, "k long").repartition(4)
    got = {
        r.k: r.seq_id
        for r in dense_ids_by_key(df, "k", num_parts=3).collect()
    }
    want = {k: i + 1 for i, (k,) in enumerate(sorted(rows))}
    assert got == want


def test_coalesce_intervals_crafted(spark):
    from dss_nlp_ingestion_spark.operators.relational import coalesce_intervals

    rows = [
        # u1: [0,10) + [5,15) merge; [15,20) touches [.,15)? start==15
        # is NOT > prev_max 15 -> merges; [30,40) separate.
        ("u1", 0, 10),
        ("u1", 5, 15),
        ("u1", 15, 20),
        ("u1", 30, 40),
        # u2: containment — [0,100) swallows [10,20)
        ("u2", 0, 100),
        ("u2", 10, 20),
    ]
    df = spark.createDataFrame(rows, "u string, s long, e long")
    got = sorted(
        (r.u, r.iv_start, r.iv_end)
        for r in coalesce_intervals(df, ["u"], "s", "e").collect()
    )
    assert got == [("u1", 0, 20), ("u1", 30, 40), ("u2", 0, 100)]


def test_hourly_acf_bounded(spark):
    rows = QUERIES["hourly_acf_lags"](spark, SF_DIR).collect()
    assert {r.lag for r in rows} == {1, 2, 3, 4, 5, 6}
    for r in rows:
        assert -1.0 <= r.acf <= 1.0
        assert r.n_pairs > 0


def test_dense_ids_branches_reuse_one_exchange(spark):
    # dense_ids_by_key dropped its .persist() on the strength of
    # exchange deduplication: the counts branch and the probe branch
    # must read the SAME shuffle output. Pin that invariant — if a
    # conf or planner change ever stops ReusedExchange from firing
    # here, this fails before any silent id skew can.
    df = QUERIES["dense_ids_orders"](spark, SF_DIR)
    df.collect()  # AQE inserts ReusedExchange at execution time
    plan = _fmt(df, spark)
    assert "ReusedExchange" in plan
