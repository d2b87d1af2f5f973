"""Batch-13 tests: winsorized mean, content checksums, skew report."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_winsorized_mean_between_caps(spark):
    from dss_nlp_ingestion_spark.catalog import table

    r = QUERIES["winsorized_mean_price"](spark, SF_DIR).collect()[0]
    raw = table(spark, SF_DIR, "orders").agg(
        F.min("o_totalprice"), F.max("o_totalprice"), F.avg("o_totalprice")
    ).collect()[0]
    assert raw[0] < r.winsor_mean < raw[1]
    # winsorization pulls tails in but should stay near the raw mean
    assert abs(r.winsor_mean - raw[2]) < raw[2] * 0.2


def test_checksum_detects_single_row_change(spark):
    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.operators.sampling import hash_order_key

    orders = table(spark, SF_DIR, "orders")
    concat = F.concat_ws(
        ":",
        F.col("o_orderkey"),
        F.col("o_orderstatus"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"),
    )

    def ck(df):
        return (
            df.select(hash_order_key(concat, "ck").alias("h"))
            .agg(F.sum(F.col("h").cast("decimal(38,0)")).cast("string"))
            .collect()[0][0]
        )

    a = ck(orders)
    k0 = orders.agg(F.min("o_orderkey")).collect()[0][0]
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") == k0, F.col("o_totalprice") + 0.01)
        .otherwise(F.col("o_totalprice")),
    )
    b = ck(mutated)
    assert a != b


def test_skew_report_consistent(spark):
    r = QUERIES["skew_diagnosis_orders"](spark, SF_DIR).collect()[0]
    assert r.p99_freq <= r.max_freq
    assert r.salt_factor >= 1
    assert r.n_rows >= r.n_keys