"""Exact-tryAdd stateful dedup tests: the applyInPandasWithState
operator against a pure-python oracle of the Redis semantics
(redislease.py:60-79 — accept anchors the TTL; rejects don't)."""

from __future__ import annotations

import datetime

import pandas as pd
import pytest

from dss_nlp_ingestion_spark.streaming.pipeline import read_events_stream
from dss_nlp_ingestion_spark.streaming.stateful import (
    accepted_tryadd_pandas,
    tryadd_dedup_stream,
)


def _mk_rows():
    t0 = datetime.datetime(2024, 1, 1)
    m = lambda mins: t0 + datetime.timedelta(minutes=mins)  # noqa: E731
    # TTL = 60 min. Accept anchors the clock:
    #   k1: 0 (accept), 30 (reject), 59 (reject), 61 (accept: 61>=0+60),
    #       100 (reject: 100-61<60), 125 (accept)
    # renewal semantics would have rejected 61 (gap to 59 is 2 min) —
    # this sequence distinguishes the two.
    return [
        ("k1", 1, m(0)),
        ("k1", 2, m(30)),
        ("k1", 3, m(59)),
        ("k1", 4, m(61)),
        ("k1", 5, m(100)),
        ("k1", 6, m(125)),
        ("k2", 7, m(5)),
    ]


EXPECTED_ACCEPTED = [1, 4, 6, 7]


def test_pandas_oracle_semantics():
    rows = _mk_rows()
    pdf = pd.DataFrame(rows, columns=["key", "event_id", "ts"])
    out_k1, last = accepted_tryadd_pandas(
        pdf[pdf.key == "k1"], ttl_ms=60 * 60 * 1000
    )
    assert sorted(out_k1.event_id) == [1, 4, 6]
    assert last == int(pd.Timestamp(datetime.datetime(2024, 1, 1, 2, 5)).value // 1e6)


def test_tryadd_stream_matches_oracle(spark, tmp_path):
    df = spark.createDataFrame(_mk_rows(), ["key", "event_id", "ts"])
    src = str(tmp_path / "tryadd_src")
    df.write.parquet(src)
    stream = read_events_stream(spark, src, schema=df.schema)
    deduped = tryadd_dedup_stream(
        stream, "key", "ts", "event_id", ttl="1 hour", ttl_ms=60 * 60 * 1000
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("tryadd_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.event_id for r in spark.table("tryadd_out").collect())
    assert got == EXPECTED_ACCEPTED


def test_tryadd_state_survives_across_batches(spark, tmp_path):
    # Two micro-batches via two source files: state (last accept) must
    # carry across — event at +30min in batch 2 is rejected because
    # batch 1 accepted at t0.
    t0 = datetime.datetime(2024, 1, 1)
    src = str(tmp_path / "tryadd_src2")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "accepted_out")
    b1 = spark.createDataFrame([("k", 1, t0)], ["key", "event_id", "ts"])
    b1.write.mode("append").parquet(src)
    schema = b1.schema

    def drain():
        stream = read_events_stream(spark, src, schema=schema)
        deduped = tryadd_dedup_stream(
            stream, "key", "ts", "event_id", ttl="1 hour", ttl_ms=3_600_000
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r.event_id for r in spark.read.parquet(out).collect())

    assert drain() == [1]
    b2 = spark.createDataFrame(
        [("k", 2, t0 + datetime.timedelta(minutes=30)),
         ("k", 3, t0 + datetime.timedelta(minutes=90))],
        ["key", "event_id", "ts"],
    )
    b2.write.mode("append").parquet(src)
    # Restarted query reads only the new file (checkpoint) and keeps
    # state: event 2 (+30min) is rejected against batch-1's accept.
    assert drain() == [1, 3]


def test_tryadd_tws_matches_applyinpandaswithstate(spark, tmp_path):
    # transformWithStateInPandas (Spark 4 typed-state API) twin of the
    # GroupState form.  Its Python workers need protobuf; pbcompat
    # discovers an on-disk pure-Python runtime when the pip package is
    # absent (get_spark wired it before the JVM launched). Skip only
    # when NO runtime exists anywhere.
    from dss_nlp_ingestion_spark.pbcompat import ensure_protobuf

    if not ensure_protobuf():
        pytest.skip("no protobuf runtime available on this host")

    from pyspark.sql import functions as F

    from dss_nlp_ingestion_spark.catalog import table
    from dss_nlp_ingestion_spark.streaming.stateful import (
        tryadd_dedup_stream,
        tryadd_dedup_stream_tws,
    )
    from tests.conftest import SF_DIR

    ev = table(spark, SF_DIR, "events").select(
        F.concat_ws("|", "user_id", "event_type").alias("key"), "event_id", "ts"
    )
    src = str(tmp_path / "tws_src")
    ev.write.mode("overwrite").parquet(src)

    # transformWithState requires the (Spark-bundled) RocksDB state
    # store — it creates one column family per typed-state handle,
    # which the default HDFS-backed provider rejects. Scoped to this
    # test; the GroupState twin runs under the default provider.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    default_provider = spark.conf.get(provider_key, None)
    outs = {}
    try:
        for name, op in (("gs", tryadd_dedup_stream), ("tws", tryadd_dedup_stream_tws)):
            if name == "tws":
                spark.conf.set(
                    provider_key,
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider",
                )
            stream = spark.readStream.schema(ev.schema).parquet(src)
            q = (
                op(stream)
                .writeStream.format("memory")
                .queryName(f"tryadd_{name}")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            outs[name] = sorted(map(tuple, spark.table(f"tryadd_{name}").collect()))
    finally:
        if default_provider is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, default_provider)
    assert outs["gs"] == outs["tws"]
