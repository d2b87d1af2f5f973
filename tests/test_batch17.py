"""Batch-17 tests: correlation profile, clamped balance fold."""

from __future__ import annotations

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_corr_profile_bounds(spark):
    rows = {r.pair: r for r in QUERIES["column_corr_profile"](spark, SF_DIR).collect()}
    assert set(rows) == {"quantity~price", "discount~tax"}
    for r in rows.values():
        assert -1.0 <= r.corr <= 1.0


def test_clamped_balance_crafted(spark):
    from dss_nlp_ingestion_spark.plans.scale_queries import (
        clamped_running_balance,
    )

    # deltas for one user: +100, -300 (clamps to 0), +250, -50 -> 200
    import datetime as dt
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(minutes=1), 7, "purchase", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=2), 7, "error", 3.0, "{}"),
        (3, base + dt.timedelta(minutes=3), 7, "purchase", 2.5, "{}"),
        (4, base + dt.timedelta(minutes=4), 7, "error", 0.5, "{}"),
        (5, base + dt.timedelta(minutes=5), 7, "view", 9.9, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="dss_bal_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").limit(1).write.mode(
            "overwrite"
        ).parquet(f"{d}/{t}.parquet")
    got = clamped_running_balance(spark, d).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.final_cents, r.peak_cents) == (200, 250)


def test_clamped_balance_never_negative_and_peak_consistent(spark):
    rows = QUERIES["clamped_running_balance"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.final_cents >= 0
        assert r.peak_cents >= r.final_cents
