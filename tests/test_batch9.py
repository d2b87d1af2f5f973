"""Batch-9 tests: gap islands, chi2, KS, quota allocation."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_missing_hour_gaps_crafted(spark):
    from dss_nlp_ingestion_spark.plans.scale_queries import missing_hour_gaps

    # hours 10,11,12, 15, 19,20 -> gaps [13,14] and [16,17,18]
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=h), 1, "view", 0.0, "{}")
        for i, h in enumerate((10, 11, 12, 15, 19, 20))
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="dss_gaps_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    got = sorted(
        (r.gap_start_hb, r.gap_hours)
        for r in missing_hour_gaps(spark, d).collect()
    )
    from dss_nlp_ingestion_spark.functions.dates import epoch_ms

    # anchor on the engine's own epoch-hour of the first event (hour
    # 10), so the expectation is timezone-convention-proof
    hb10 = df.select(
        F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb")
    ).agg(F.min("hb")).collect()[0][0]
    assert got == [(hb10 + 3, 2), (hb10 + 6, 3)]


def test_chi2_nonnegative_and_frequent(spark):
    rows = QUERIES["copurchase_chi2_topk"](spark, SF_DIR).collect()
    for r in rows:
        assert r.chi2 >= 0.0
        assert r.support >= 2


def test_ks_bounds(spark):
    rows = QUERIES["ks_price_by_segment"](spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0.0 <= r.ks <= 1.0
    assert r.ks_num <= r.n1 * r.n2


def test_quota_sums_to_total(spark):
    rows = QUERIES["largest_remainder_allocation"](spark, SF_DIR).collect()
    assert sum(r.quota for r in rows) == 1000
    total = sum(r.n_docs for r in rows)
    for r in rows:
        # quota within 1 of the exact proportional share
        assert abs(r.quota - r.n_docs * 1000 / total) < 1.0
