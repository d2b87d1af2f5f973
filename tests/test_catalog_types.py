"""Catalog-boundary type guarantees.

The r3 regression: the generator switched events.ts from
TIMESTAMP(NANOS) to plain timestamp[us] with isAdjustedToUTC=false,
which newer readers infer as TIMESTAMP_NTZ — and every epoch call
site (unix_millis, session_window epoch extraction) then fails.
These tests pin the contract: whatever the writer emitted,
catalog.table() hands downstream operators a plain TIMESTAMP column,
and epoch_ms() is total over both timestamp types either way."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.dates import epoch_ms
from tests.conftest import SF_DIR


def test_events_ts_reads_as_timestamp_not_ntz(spark):
    df = table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_epoch_ms_total_over_both_timestamp_types(spark):
    ts = datetime.datetime(2024, 1, 15, 13, 45, 0)
    df = spark.createDataFrame([(ts,)], "t timestamp").select(
        epoch_ms(F.col("t")).alias("m1"),
        epoch_ms(F.col("t").cast("timestamp_ntz")).alias("m2"),
    )
    row = df.collect()[0]
    # Session tz is UTC, so the NTZ wall clock is the same instant.
    assert row.m1 == row.m2 == 1705326300000


def test_epoch_ms_matches_unix_millis_on_plain_timestamp(spark):
    df = table(spark, SF_DIR, "events").limit(100).select(
        epoch_ms(F.col("ts")).alias("a"), F.unix_millis("ts").alias("b")
    )
    assert df.filter(F.col("a") != F.col("b")).count() == 0
