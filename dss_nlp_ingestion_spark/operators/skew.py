"""Skew-mitigation operators (SURVEY.md §7.1 100 TB posture).

AQE's skew-join splitting (enabled in ``session.DEFAULT_CONF``)
handles sort-merge-join skew at runtime; these helpers cover the two
places AQE can't:

- ``salted_aggregate`` — a groupBy whose key distribution is so hot
  that single reducers OOM (e.g. counting mentions per mega-ticker
  across 100 TB of documents): two-phase aggregation through a salted
  intermediate key. Semantically transparent for any algebraic
  aggregate expressed as (partial, merge) pairs.
- ``salted_join`` — fact-to-dim equi-join where a handful of dim keys
  dominate the fact side and the dim is too big to broadcast whole:
  explode the dim ``salt`` ways, salt the fact randomly-but-
  deterministically (hash of a row id), join on (key, salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    group_cols: Sequence[str],
    aggs: dict[str, tuple[Column, Column]],
    salt_col: str | Column | None = None,
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (partial_agg_expr, merge_agg_expr)
    where the partial runs per (group, salt) and the merge combines
    partials per group, e.g.::

        {"n": (F.count(F.lit(1)), F.sum("n")),
         "total": (F.sum("x"), F.sum("total"))}

    Salt defaults to a deterministic hash of the whole row spread over
    ``salt_buckets``; pass a column for a cheaper/explicit salt.
    """
    if salt_col is None:
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    elif isinstance(salt_col, str):
        salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_buckets))
    else:
        salt = salt_col
    partial = df.withColumn("_salt", salt).groupBy(*group_cols, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    fact_salt_source: str | None = None,
) -> DataFrame:
    """Skew-safe fact⋈dim equi-join: replicate each dim row into
    ``salt_buckets`` salted copies, give each fact row one
    deterministic salt, join on (key, salt). The hot key's fact rows
    spread over ``salt_buckets`` reducers instead of one."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("_salt")
    dim_salted = dim.select("*", salts)
    src = fact_salt_source or on
    fact_salted = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(src), F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    return fact_salted.join(dim_salted, [on, "_salt"]).drop("_salt")
