"""SQL front door for tx-table DML: the textual surface
(`DELETE FROM`/`UPDATE`/`MERGE`-less ops Spark SQL can't run on raw
parquet) routed to the implemented log-native operations, so a SQL
user drives the ACID table without touching the Python API.

Supported statements (case-insensitive keywords):

    DELETE FROM <t> WHERE <predicate>
    UPDATE <t> SET col = expr [, col = expr ...] WHERE <predicate>
    OPTIMIZE <t>
    OPTIMIZE <t> ZORDER BY (c1, c2)
    VACUUM <t> [RETAIN <version>]
    RESTORE <t> TO VERSION AS OF <v>

``VACUUM <t>`` keeps txlog.vacuum's default mtime grace window, so
files a concurrent writer has staged but not yet committed survive;
``VACUUM <t> RETAIN <v>`` reclaims time-travel history and REQUIRES
that no writers are active (see ``txlog.vacuum_retain``).

    ALTER TABLE <t> RENAME COLUMN <a> TO <b>

Predicates/SET expressions pass through VERBATIM to the engine ops
(Spark SQL expression text) — this is a ROUTER, not an expression
compiler; anything Spark can evaluate works. Table names resolve
through the caller-supplied {name: path} catalog."""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from dss_nlp_ingestion_spark.sources import txlog

_DELETE = re.compile(r"^\s*DELETE\s+FROM\s+(\w+)\s+WHERE\s+(.+?)\s*;?\s*$",
                     re.IGNORECASE | re.DOTALL)
_UPDATE = re.compile(
    r"^\s*UPDATE\s+(\w+)\s+SET\s+(.+?)\s+WHERE\s+(.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_OPTIMIZE = re.compile(
    r"^\s*OPTIMIZE\s+(\w+)\s*(?:ZORDER\s+BY\s*\(\s*([\w\s,]+?)\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)
_VACUUM = re.compile(
    r"^\s*VACUUM\s+(\w+)\s*(?:RETAIN\s+(\d+))?\s*;?\s*$", re.IGNORECASE
)
_RESTORE = re.compile(
    r"^\s*RESTORE\s+(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*$",
    re.IGNORECASE,
)
_RENAME = re.compile(
    r"^\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*$",
    re.IGNORECASE,
)
#: top-level comma split for the SET list (commas inside one level of
#: parentheses — function calls — are preserved)
_SET_SPLIT = re.compile(r",(?![^()]*\))")


def execute_dml(spark: SparkSession, statement: str, tables: dict) -> dict:
    """Route one DML statement to the tx-table engine op. Returns the
    op's summary dict plus {"op": ...}. Unknown table or syntax ->
    ValueError (never silently a no-op)."""

    def path(name: str) -> str:
        if name not in tables:
            raise ValueError(f"unknown tx table '{name}' (catalog: {sorted(tables)})")
        return tables[name]

    if m := _DELETE.match(statement):
        res = txlog.delete_from_table(spark, path(m.group(1)), m.group(2))
        return {"op": "delete", **res}
    if m := _UPDATE.match(statement):
        sets = {}
        for part in _SET_SPLIT.split(m.group(2)):
            col, _, expr = part.partition("=")
            if not _:
                raise ValueError(f"bad SET clause: {part!r}")
            sets[col.strip()] = expr.strip()
        res = txlog.update_table(spark, path(m.group(1)), m.group(3), sets)
        return {"op": "update", **res}
    if m := _OPTIMIZE.match(statement):
        if m.group(2):
            cols = [c.strip() for c in m.group(2).split(",")]
            v = txlog.optimize_zorder(spark, path(m.group(1)), cols)
            return {"op": "optimize_zorder", "version": v}
        v = txlog.compact(spark, path(m.group(1)))
        return {"op": "optimize", "version": v}
    if m := _VACUUM.match(statement):
        if m.group(2) is not None:
            return {"op": "vacuum_retain",
                    **txlog.vacuum_retain(path(m.group(1)), int(m.group(2)))}
        return {"op": "vacuum", "removed": txlog.vacuum(path(m.group(1)))}
    if m := _RESTORE.match(statement):
        v = txlog.restore_table(path(m.group(1)), int(m.group(2)))
        return {"op": "restore", "version": v}
    if m := _RENAME.match(statement):
        v = txlog.rename_column(path(m.group(1)), m.group(2), m.group(3))
        return {"op": "rename", "version": v}
    raise ValueError(f"unsupported DML statement: {statement[:120]!r}")

_MERGE = re.compile(
    r"^\s*MERGE\s+INTO\s+(\w+)\s+USING\s+(\w+)\s+ON\s+"
    r"\1\.(\w+)\s*=\s*\2\.(\w+)\s*"
    r"(?:WHEN\s+MATCHED\s+AND\s+\2\.(\w+)\s+THEN\s+DELETE\s+)?"
    r"WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+"
    r"WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*$",
    re.IGNORECASE,
)


def execute_merge(spark: SparkSession, statement: str, tables: dict) -> dict:
    """ANSI-shaped ``MERGE INTO t USING <view> ON t.k = v.k [WHEN
    MATCHED AND v.<flag> THEN DELETE] WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *`` — the canonical upsert statement
    routed to the file-pruned ACID merge. ``<view>`` is a registered
    Spark temp view (the source relation); the two ON columns must
    name the same key. Only this canonical clause shape is accepted —
    anything else raises (no silent semantic drift)."""
    m = _MERGE.match(statement)
    if not m:
        raise ValueError(
            "unsupported MERGE shape (expected: MERGE INTO t USING v ON "
            f"t.k = v.k [...] UPDATE SET * / INSERT *): {statement[:120]!r}"
        )
    tname, vname, tkey, vkey, delcol = m.groups()
    if tkey != vkey:
        raise ValueError(f"ON keys must match: {tkey} != {vkey}")
    if tname not in tables:
        raise ValueError(f"unknown tx table '{tname}' (catalog: {sorted(tables)})")
    src = spark.table(vname)
    res = txlog.merge_into_table(
        spark, tables[tname], src, [tkey], delete_col=delcol
    )
    return {"op": "merge", **res}
