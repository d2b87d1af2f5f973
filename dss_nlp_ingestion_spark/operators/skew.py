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


def blocked_self_pairs(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int = 1000,
) -> DataFrame:
    """Skew-safe intra-group pair generation: all unordered pairs of
    rows sharing ``group_col``, with per-join-task work bounded by
    ``cap^2`` regardless of how degenerate a group is.

    A plain group-keyed self-join puts an n-row group's n^2 pairs in
    one reducer; here each group is hash-split into ``g = ceil(n /
    cap)`` subgroups and the pair space is covered by the g*(g+1)/2
    subgroup blocks (i <= j): the left side replicates each row into
    blocks (sub, j >= sub), the right side into blocks (i <= sub, sub),
    and the join key is (group, block_i, block_j).  Every unordered
    pair lands in exactly one block — diagonal blocks dedupe by id
    order, off-diagonal blocks are disjoint by construction — so the
    result is IDENTICAL to the naive self-join while the heaviest
    task is cap^2.

    Returns the joined pairs with every ``df`` column suffixed _a/_b
    (ids NOT normalized on off-diagonal blocks: callers with
    symmetric payloads normalize with least/greatest).

    Caller contract: the broadcast below is one row per GROUP (e.g.
    ≤2^n_planes LSH buckets), never per input row — callers with an
    unbounded group domain should pre-aggregate or accept a shuffle
    join by removing the hint.
    """
    sizes = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    with_g = F.broadcast(
        sizes.select(
            group_col,
            F.greatest(F.lit(1), F.ceil(F.col("_n") / cap)).cast("int").alias("_g"),
        )
    )
    sized = df.join(with_g, group_col).withColumn(
        "_sub", F.pmod(F.xxhash64(F.col(id_col)), F.col("_g")).cast("int")
    )
    left = sized.withColumn(
        "_blk_j", F.explode(F.sequence(F.col("_sub"), F.col("_g") - 1))
    ).withColumnRenamed("_sub", "_blk_i")
    right = sized.withColumn(
        "_blk_i", F.explode(F.sequence(F.lit(0), F.col("_sub")))
    ).withColumnRenamed("_sub", "_blk_j")
    a = left.select(
        F.col(group_col), "_blk_i", "_blk_j",
        *[F.col(c).alias(f"{c}_a") for c in df.columns if c != group_col],
    )
    b = right.select(
        F.col(group_col), "_blk_i", "_blk_j",
        *[F.col(c).alias(f"{c}_b") for c in df.columns if c != group_col],
    )
    ida, idb = F.col(f"{id_col}_a"), F.col(f"{id_col}_b")
    # Pin the pair-join's partition COUNT (r10 sf10 finding): the
    # block keys spread a hot group's g*(g+1)/2 combos across the key
    # space, but AQE's size-based partition coalescing then merges
    # these byte-LIGHT, CPU-DENSE partitions (each output row costs a
    # dim-wide similarity evaluation downstream) back into a handful
    # of tasks — measured at sf10: 12 post-coalesce partitions, 8
    # done in 2-8 s, 4 stragglers >211 s, 28 of 32 cores idle. A
    # user-specified repartition count is exempt from AQE coalescing
    # (REPARTITION_BY_NUM shuffle origin), and since it lands on the
    # join keys the join reuses the exchange — no extra shuffle.
    shuffle_n = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    keys = [group_col, "_blk_i", "_blk_j"]
    a = a.repartition(shuffle_n, *[F.col(k) for k in keys])
    b = b.repartition(shuffle_n, *[F.col(k) for k in keys])
    return (
        a.join(b, keys)
        .filter((F.col("_blk_i") != F.col("_blk_j")) | (ida < idb))
        .filter(ida != idb)
        .drop("_blk_i", "_blk_j")
    )
