"""MERGE INTO (upsert) semantics as a pure DataFrame transform.

The reference's store writes are upserts: ``_id``-keyed index calls
that overwrite matched documents and insert new ones
(src/base.py:239-253 bulk index with explicit ``_id``). The lakehouse
twin of that sink semantics is ``MERGE INTO`` — re-expressed here as a
single full-outer join so it runs on any DataFrame source, returns the
merged relation, and stays oracle-checkable (the engine-side sinks in
``sources.sinks`` already cover the write-path idempotence).

Scale shape: one shuffle of each side on the merge key (or a broadcast
of the source when it is delta-sized, which is the common case —
Catalyst/AQE picks that automatically when the source fits); no other
stage touches the full target. This is exactly the join Delta/Iceberg
MERGE compiles to before file rewriting, minus the transaction log.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_cond(tgt: DataFrame, src: DataFrame, key_cols: Sequence[str],
              null_safe: bool) -> Column:
    if null_safe:
        terms = [tgt[k].eqNullSafe(src[f"_s_{k}"]) for k in key_cols]
    else:
        terms = [tgt[k] == src[f"_s_{k}"] for k in key_cols]
    return reduce(lambda a, b: a & b, terms)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    insert_only: bool = False,
    null_safe: bool = False,
) -> DataFrame:
    """Return ``target`` merged with ``source`` on ``key_cols``:

    - matched rows take the source's values (WHEN MATCHED THEN UPDATE
      SET *) — unless ``insert_only``, which keeps the target row
      (the reference's replicate-if-absent / K4 semantics);
    - source rows with no match are inserted (WHEN NOT MATCHED THEN
      INSERT *);
    - target rows with no match are kept.

    ``source`` must have (at least) the target's columns. By default
    the join is PLAIN equality, so NULL merge keys never match (SQL
    MERGE semantics): a NULL-keyed source row falls out as an
    unmatched source row and is INSERTED with its values intact.
    ``null_safe`` switches the key comparison to ``<=>`` (eqNullSafe)
    for callers whose keys are GROUP-BY outputs — there NULL is an
    ordinary key value and plain equality silently duplicates the
    NULL-keyed group (r5 advisor finding on the matview refresh).
    Which side a joined row carries is decided by always-non-null
    presence markers added before the join — never by key-null
    inspection, so NULL source values are not mistaken for "no match".
    """
    cols = target.columns
    src = source.select(
        [F.col(c).alias(f"_s_{c}") for c in cols]
    ).withColumn("_s_present", F.lit(True))
    tgt = target.withColumn("_t_present", F.lit(True))
    cond = _key_cond(tgt, src, key_cols, null_safe)
    joined = tgt.join(src, cond, "full_outer")
    has_source = src["_s_present"].isNotNull()
    has_target = tgt["_t_present"].isNotNull()
    out = []
    for c in cols:
        take_source = has_source & (~has_target if insert_only else F.lit(True))
        out.append(
            F.when(take_source, src[f"_s_{c}"]).otherwise(tgt[c]).alias(c)
        )
    return joined.select(*out)


def merge_into_with_delete(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    delete_col: str,
    null_safe: bool = False,
) -> DataFrame:
    """Full MERGE surface: WHEN MATCHED AND source.<delete_col> THEN
    DELETE / WHEN MATCHED THEN UPDATE SET * / WHEN NOT MATCHED THEN
    INSERT *. ``delete_col`` is a boolean column on ``source``
    (tombstone flag — the CDC convention); a flagged row whose key is
    absent from the target is a no-op, matching Delta/Iceberg MERGE.
    ``null_safe`` as in :func:`merge_into` (``<=>`` keys for GROUP-BY-
    keyed callers like the matview). Same single full-outer join shape
    as :func:`merge_into` — the delete clause adds a filter, not a
    stage."""
    cols = target.columns
    src = source.select(
        [F.col(c).alias(f"_s_{c}") for c in cols]
        + [F.col(delete_col).alias("_s_del")]
    ).withColumn("_s_present", F.lit(True))
    tgt = target.withColumn("_t_present", F.lit(True))
    cond = _key_cond(tgt, src, key_cols, null_safe)
    joined = tgt.join(src, cond, "full_outer")
    has_source = src["_s_present"].isNotNull()
    has_target = tgt["_t_present"].isNotNull()
    deleted = has_source & has_target & F.coalesce(src["_s_del"], F.lit(False))
    insert_noop = has_source & ~has_target & F.coalesce(
        src["_s_del"], F.lit(False)
    )
    kept = joined.filter(~deleted & ~insert_noop)
    out = [
        F.when(has_source, src[f"_s_{c}"]).otherwise(tgt[c]).alias(c)
        for c in cols
    ]
    return kept.select(*out)
