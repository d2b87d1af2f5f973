"""As-of join (SURVEY.md §2.5 notes the reference lacks range/as-of
joins; a training-data/event pipeline needs them constantly — "state
as of event time").

``asof_join_union`` implements left-asof via the union+window trick
instead of a join: tag right rows, union with left rows, sort once per
key by time, and carry the last right value forward with
``last_value(ignorenulls)``. One shuffle + one sort total —
dramatically better than the naive range-join (which explodes into
per-pair comparisons) and the shape that scales: state size is one
row per key, not a join frontier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.functions.dates import epoch_ms


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    right_value_cols: Sequence[str],
    tolerance_ms: int | None = None,
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row of the same
    key with ``right.ts < left.ts`` (``strict``; <= otherwise).
    ``tolerance_ms`` drops matches older than the tolerance.

    Returns the left rows plus ``asof_<col>`` columns (NULL when no
    prior right row exists)."""
    keys = list(key_cols)
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols, F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in right_value_cols],
        F.lit(None).cast("long").alias("_r_ms"),
    )
    r = right.select(
        *[F.col(c) for c in keys],
        F.col(ts_col),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys and c != ts_col],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_rv_{c}") for c in right_value_cols],
        epoch_ms(F.col(ts_col)).alias("_r_ms"),
    ).select(*[F.col(c) for c in l.columns])  # align column order

    unioned = l.unionByName(r)
    # Right rows sort before left rows at equal ts iff matches at the
    # same instant are allowed (non-strict).
    tie = F.col("_is_left").asc() if not strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), tie)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_value_cols
        ],
        F.last("_r_ms", ignorenulls=True).over(w).alias("_asof_ms"),
    )
    out = carried.filter(F.col("_is_left") == 1)
    if tolerance_ms is not None:
        within = epoch_ms(F.col(ts_col)) - F.col("_asof_ms") <= F.lit(tolerance_ms)
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in right_value_cols
            ],
        )
    else:
        out = out.select(*lcols, *[F.col(f"asof_{c}") for c in right_value_cols])
    return out
