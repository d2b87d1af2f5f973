"""Retention-job test (§2.12 ILM delete-phase analog)."""

from __future__ import annotations

import datetime

from dss_nlp_ingestion_spark.sources.sinks import (
    bulk_append,
    read_store,
    retention_delete,
)


def test_retention_delete(spark, tmp_path):
    store = str(tmp_path / "retstore")
    base = datetime.datetime(2024, 1, 1)
    rows = [
        ("a", "s1", base),
        ("b", "s1", base + datetime.timedelta(days=100)),
        ("c", "s2", base + datetime.timedelta(days=200)),
    ]
    df = spark.createDataFrame(rows, ["unique_identifier", "source", "time"])
    bulk_append(df, store)

    n = retention_delete(spark, store, "time", "2024-04-01 00:00:00")
    assert n == 1  # only 'a' expired
    remaining = read_store(spark, store)
    assert sorted(r.unique_identifier for r in remaining.collect()) == ["b", "c"]
    # Partition layout survives the rewrite.
    assert set(r.source for r in remaining.collect()) == {"s1", "s2"}
    # Idempotent when nothing is expired.
    assert retention_delete(spark, store, "time", "2024-04-01 00:00:00") == 0
