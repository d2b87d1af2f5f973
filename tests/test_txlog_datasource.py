"""format("txlog") Python Data Source: batch snapshot/time-travel
reads and the versions-as-offsets streaming CDC feed."""

from __future__ import annotations

import tempfile

from dss_nlp_ingestion_spark.sources import txlog
from dss_nlp_ingestion_spark.sources.txlog_datasource import TxLogDataSource


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _registered(spark):
    spark.dataSource.register(TxLogDataSource)
    return spark


def test_batch_read_matches_library_read(spark):
    _registered(spark)
    path = tempfile.mkdtemp(prefix="dss_txds_") + "/t"
    txlog.create_table(_tbl(spark, [(1, "a"), (2, "b")]), path)
    txlog.append(_tbl(spark, [(3, "c")]), path)
    got = spark.read.format("txlog").option("path", path).load()
    assert sorted((r["k"], r["v"]) for r in got.collect()) == [
        (1, "a"), (2, "b"), (3, "c")
    ]
    assert got.schema == txlog.read(spark, path).schema


def test_batch_time_travel_option(spark):
    _registered(spark)
    path = tempfile.mkdtemp(prefix="dss_txds_") + "/t"
    txlog.create_table(_tbl(spark, [(1, "a")]), path)
    txlog.append(_tbl(spark, [(2, "b")]), path)
    v0 = (
        spark.read.format("txlog")
        .option("path", path)
        .option("version", "0")
        .load()
    )
    assert [r["k"] for r in v0.collect()] == [1]


def test_stream_reads_commits_exactly_once(spark, tmp_path):
    _registered(spark)
    path = tempfile.mkdtemp(prefix="dss_txds_") + "/t"
    ckpt = str(tmp_path / "ckpt")
    txlog.create_table(_tbl(spark, [(1, "a"), (2, "b")]), path)

    def drain():
        got: list[tuple] = []

        def sink(batch_df, _bid):
            got.extend((r["k"], r["v"]) for r in batch_df.collect())

        q = (
            spark.readStream.format("txlog")
            .option("path", path)
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(got)

    assert drain() == [(1, "a"), (2, "b")]
    # new commits arrive as a NEW batch only (offset checkpointed)
    txlog.append(_tbl(spark, [(3, "c")]), path)
    txlog.append(_tbl(spark, [(4, "d")]), path)
    assert drain() == [(3, "c"), (4, "d")]
    # no new commits -> empty increment
    assert drain() == []
