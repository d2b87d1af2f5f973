"""Transaction-log table format (sources/txlog.py): commit atomicity,
optimistic retry, rewrite conflicts, time travel, vacuum safety."""

from __future__ import annotations

import os
import tempfile

import pytest

from dss_nlp_ingestion_spark.sources import txlog


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def test_create_append_read_roundtrip(spark):
    path = tempfile.mkdtemp(prefix="dss_tx_")
    txlog.create_table(_tbl(spark, [(1, "a"), (2, "b")]), path)
    v = txlog.append(_tbl(spark, [(3, "c")]), path)
    assert v == 1
    got = sorted((r["k"], r["v"]) for r in txlog.read(spark, path).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    ops = [h["op"] for h in txlog.history(path)]
    assert ops == ["create", "append"]


def test_time_travel_reads_old_snapshot(spark):
    path = tempfile.mkdtemp(prefix="dss_tx_")
    txlog.create_table(_tbl(spark, [(1, "a")]), path)
    txlog.append(_tbl(spark, [(2, "b")]), path)
    v0 = sorted(r["k"] for r in txlog.read(spark, path, version=0).collect())
    v1 = sorted(r["k"] for r in txlog.read(spark, path, version=1).collect())
    assert v0 == [1] and v1 == [1, 2]
    with pytest.raises(ValueError):
        txlog.read(spark, path, version=7)


def test_staged_files_invisible_until_commit(spark):
    """A writer that crashes after staging data but before the log
    commit leaves the table unchanged — readers fold the log, not
    the directory."""
    path = tempfile.mkdtemp(prefix="dss_tx_")
    txlog.create_table(_tbl(spark, [(1, "a")]), path)
    # stage without committing (the first half of append)
    txlog._write_data_files(_tbl(spark, [(99, "zz")]), path)
    got = sorted(r["k"] for r in txlog.read(spark, path).collect())
    assert got == [1]
    # vacuum removes exactly the orphaned staging files
    removed = txlog.vacuum(path)
    assert removed and all(r.endswith(".parquet") for r in removed)
    assert sorted(r["k"] for r in txlog.read(spark, path).collect()) == [1]
    assert txlog.vacuum(path) == []  # nothing left to clean


def test_append_retries_past_commit_race(spark):
    """O_EXCL arbitration: if another writer claims the next version
    first, the append retries and lands one version later — no data
    lost, no torn log."""
    path = tempfile.mkdtemp(prefix="dss_tx_")
    txlog.create_table(_tbl(spark, [(1, "a")]), path)
    # simulate a racing winner for version 1
    assert txlog._try_commit(path, 1, {"op": "append", "add": [], "remove": []})
    v = txlog.append(_tbl(spark, [(2, "b")]), path)
    assert v == 2
    assert sorted(r["k"] for r in txlog.read(spark, path).collect()) == [1, 2]


def test_rewrite_conflict_on_stale_base(spark):
    """Two compactors race: the loser's base files were removed by
    the winner's commit -> TxConflictError, table stays consistent."""
    path = tempfile.mkdtemp(prefix="dss_tx_")
    txlog.create_table(_tbl(spark, [(1, "a"), (2, "b")]), path)
    base = [
        os.path.relpath(f, os.path.join(path, "data"))
        for f in txlog.snapshot_files(path)
    ]
    txlog.rewrite(_tbl(spark, [(1, "a2"), (2, "b2")]), path, base, expect_version=0)
    with pytest.raises(txlog.TxConflictError):
        txlog.rewrite(
            _tbl(spark, [(1, "a3"), (2, "b3")]), path, base, expect_version=0
        )
    got = sorted((r["k"], r["v"]) for r in txlog.read(spark, path).collect())
    assert got == [(1, "a2"), (2, "b2")]


def test_rewrite_commutes_with_concurrent_append(spark):
    """A rewrite whose base files are untouched by an interleaved
    append commits on top of it (appends add disjoint files)."""
    path = tempfile.mkdtemp(prefix="dss_tx_")
    txlog.create_table(_tbl(spark, [(1, "a")]), path)
    base = [
        os.path.relpath(f, os.path.join(path, "data"))
        for f in txlog.snapshot_files(path)
    ]
    txlog.append(_tbl(spark, [(2, "b")]), path)  # concurrent append
    v = txlog.rewrite(_tbl(spark, [(1, "a2")]), path, base, expect_version=0)
    assert v == 2
    got = sorted((r["k"], r["v"]) for r in txlog.read(spark, path).collect())
    assert got == [(1, "a2"), (2, "b")]
    # time travel still sees every committed state
    assert sorted(r["k"] for r in txlog.read(spark, path, version=1).collect()) == [1, 2]
