"""Batch-14 tests: LATERAL rewrite, streaming multitxn sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_lateral_rewrites_to_group_limit(spark):
    df = QUERIES["lateral_top_orders"](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the correlated LIMIT must become a windowed group limit, never
    # per-row re-execution or a cartesian product
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    # at most 2 orders per customer
    counts = (
        df.groupBy("c_custkey").count().agg(F.max("count")).collect()[0][0]
    )
    assert counts <= 2


def test_streaming_multitxn_matches_batch(spark):
    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.functions.dates import epoch_ms

    got = {
        r.hb: r.c
        for r in QUERIES["streaming_multitxn_sink"](spark, SF_DIR).collect()
    }
    want = {
        r.hb: r.c
        for r in table(spark, SF_DIR, "events")
        .select(F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .collect()
    }
    assert got == want
