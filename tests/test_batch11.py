"""Batch-11 tests: partitioned layout — dynamic overwrite + DPP."""

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


def test_partition_filter_prunes_at_planning_time(spark):
    from dss_nlp_ingestion_spark.plans.scale_queries import (
        partitioned_orders_path,
    )

    base = partitioned_orders_path(spark, SF_DIR)
    df = spark.read.parquet(base).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plan = _fmt(df, spark)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:")[1].split("\n")[0]
    assert "o_orderpriority" in seg


def test_dpp_join_plans_dynamic_pruning(spark):
    plan = _fmt(QUERIES["dpp_partitioned_join"](spark, SF_DIR), spark)
    assert "dynamicpruning" in plan.lower()


def test_dynamic_overwrite_touches_one_partition(spark):
    import os
    import tempfile

    from dss_nlp_ingestion_spark.catalog import table

    orders = table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    base = tempfile.mkdtemp(prefix="dss_dynpart_t_") + "/orders"
    orders.write.partitionBy("o_orderpriority").mode("overwrite").parquet(
        base
    )

    def _files(prio):
        d = os.path.join(base, f"o_orderpriority={prio}")
        return sorted(
            f for f in os.listdir(d) if f.endswith(".parquet")
        )

    before_urgent = _files("1-URGENT")
    before_high = _files("2-HIGH")
    prev = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "STATIC"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(
                "o_orderkey",
                (F.col("o_totalprice") * 2).alias("o_totalprice"),
                "o_orderpriority",
            )
            .write.partitionBy("o_orderpriority")
            .mode("overwrite")
            .parquet(base)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    assert _files("1-URGENT") != before_urgent  # rewritten
    assert _files("2-HIGH") == before_high  # untouched
