"""Batch-15 tests: rule confidence, degree buckets, AQE coalesce."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_rule_confidence_bounds(spark):
    rows = QUERIES["association_rules_confidence"](spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 < r.confidence <= 1.0
        assert r.support <= r.s_ante


def test_degree_buckets_partition_degrees(spark):
    rows = QUERIES["degree_distribution_log2"](spark, SF_DIR).collect()
    for r in rows:
        assert (1 << r.log2_bucket) <= r.min_degree
        assert r.max_degree < (1 << (r.log2_bucket + 1))


def test_aqe_coalesces_small_shuffle(spark):
    # 200 shuffle partitions for a 5-group aggregate: AQE must
    # coalesce the read side instead of launching 200 reduce tasks.
    from dss_nlp_ingestion_spark.catalog import table

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "200")
    try:
        df = (
            table(spark, SF_DIR, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        df.collect()  # materialize so AQE finalizes the plan
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "AQEShuffleRead" in plan and "coalesced" in plan
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
