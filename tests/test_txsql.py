"""SQL DML front door (sources/txsql.py): routing, verbatim predicate
passthrough, and loud failures on unknown tables/statements."""

from __future__ import annotations

import tempfile

import pytest

from dss_nlp_ingestion_spark.sources import txlog, txsql


def _make(spark, n=20):
    path = tempfile.mkdtemp(prefix="dss_txsql_") + "/t"
    rows = [(i, f"c{i % 5}", float(i)) for i in range(n)]
    txlog.create_table(
        spark.createDataFrame(rows, "k long, c string, p double")
        .repartitionByRange(2, "k"),
        path,
        stats_cols=["k"],
    )
    return path


def test_sql_delete_update_route_and_apply(spark):
    path = _make(spark)
    cat = {"t": path}
    r = txsql.execute_dml(spark, "DELETE FROM t WHERE k % 4 = 0", cat)
    assert r["op"] == "delete" and r["files_touched"] >= 1
    r = txsql.execute_dml(
        spark, "UPDATE t SET p = p * 2, c = concat(c, '!') WHERE k = 3", cat
    )
    assert r["op"] == "update"
    got = {row["k"]: (row["c"], row["p"]) for row in txlog.read(spark, path).collect()}
    assert 4 not in got and 0 not in got
    assert got[3] == ("c3!", 6.0)
    assert got[5] == ("c0", 5.0)


def test_sql_optimize_vacuum_restore_rename(spark):
    path = _make(spark)
    cat = {"t": path}
    for i in (100, 101, 102):
        txlog.append(
            spark.createDataFrame([(i, "x", 1.0)], "k long, c string, p double"),
            path,
        )
    r = txsql.execute_dml(spark, "OPTIMIZE t", cat)
    assert r["op"] == "optimize" and len(txlog.snapshot_files(path)) == 1
    r = txsql.execute_dml(spark, "OPTIMIZE t ZORDER BY (k, p)", cat)
    assert r["op"] == "optimize_zorder"
    r = txsql.execute_dml(spark, "RESTORE t TO VERSION AS OF 0", cat)
    assert r["op"] == "restore"
    assert sorted(row["k"] for row in txlog.read(spark, path).collect()) == list(range(20))
    r = txsql.execute_dml(spark, "ALTER TABLE t RENAME COLUMN p TO price", cat)
    assert r["op"] == "rename"
    assert "price" in txlog.read(spark, path).columns
    r = txsql.execute_dml(spark, "VACUUM t", cat)
    assert r["op"] == "vacuum"


def test_sql_rejects_unknown_table_and_statement(spark):
    path = _make(spark)
    with pytest.raises(ValueError, match="unknown tx table"):
        txsql.execute_dml(spark, "DELETE FROM nope WHERE k = 1", {"t": path})
    with pytest.raises(ValueError, match="unsupported DML"):
        txsql.execute_dml(spark, "TRUNCATE TABLE t", {"t": path})
    with pytest.raises(ValueError, match="bad SET clause"):
        txsql.execute_dml(spark, "UPDATE t SET oops WHERE k = 1", {"t": path})


def test_sql_merge_canonical_shape_routes_to_acid_merge(spark):
    path = _make(spark, n=10)
    cat = {"t": path}
    src = spark.createDataFrame(
        [(3, "upd", 99.0, False), (50, "new", 1.0, False), (4, "x", 0.0, True)],
        "k long, c string, p double, del boolean",
    )
    src.createOrReplaceTempView("changes")
    r = txsql.execute_merge(
        spark,
        "MERGE INTO t USING changes ON t.k = changes.k "
        "WHEN MATCHED AND changes.del THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        cat,
    )
    assert r["op"] == "merge"
    got = {row["k"]: row["c"] for row in txlog.read(spark, path).collect()}
    assert got[3] == "upd" and got[50] == "new" and 4 not in got
    assert len(got) == 10  # 10 - 1 deleted + 1 inserted


def test_sql_merge_rejects_noncanonical_shapes(spark):
    path = _make(spark, n=4)
    with pytest.raises(ValueError, match="unsupported MERGE"):
        txsql.execute_merge(
            spark, "MERGE INTO t USING v ON t.k = v.j WHEN MATCHED THEN DELETE",
            {"t": path},
        )
