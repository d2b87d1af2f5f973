"""Relational operators (SURVEY.md §2.3–§2.8).

Reference parity notes (citations are file:line into
/root/reference):

- ``majority_vote``       — src/utils/general_utils.py:126-147
  (``get_sector``: mode of a group with share > 0.666 else null).
- ``hierarchical_rollup`` — src/utils/general_utils.py:150-184
  (``get_sector_loose``: divide the code by 10^trim, coarsening until
  some value wins > 0.5 share; give up after the level list).
- ``ttl_dedup``           — src/base.py:210-218 +
  src/historydb/redislease.py:60-79 (Redis SETEX 7-day history).
  Batch semantics here: an occurrence is *accepted* iff no occurrence
  of the same key exists within the TTL window before it ("renewal"
  reading — any sighting refreshes the clock). Expressed with a lag
  window so it is pure SQL, shuffle-once, and scale-safe.
- ``topk_per_group``      — Counter.most_common-style top-k
  (src/utils/general_utils.py:143,179) as a rank window.
- ``anti_join_new`` / ``semi_join_known`` — insert-if-absent /
  membership checks (src/workqueue_setup.py:35-44,
  src/lurkers/reddit.py:89) as broadcast-able anti/semi joins.

Scale posture: every operator is expressed with joins/windows on
explicit keys so Catalyst chooses broadcast vs shuffle via AQE; no
driver-side collection anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.functions.dates import epoch_ms


def majority_vote(
    df: DataFrame,
    group_cols: Sequence[str],
    vote_col: str,
    threshold: float = 0.666,
    out_col: str = "majority",
) -> DataFrame:
    """Per group, the modal value of ``vote_col`` if its share strictly
    exceeds ``threshold``, else NULL. Ties break to the smallest vote
    value (deterministic, unlike the reference's insertion-order
    Counter tie-break — documented semantic pin, SURVEY.md §7.4.2).
    """
    counts = df.groupBy(*group_cols, vote_col).agg(F.count(F.lit(1)).alias("_votes"))
    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    ranked = (
        counts.withColumn("_total", F.sum("_votes").over(w))
        .withColumn(
            "_rn",
            F.row_number().over(w.orderBy(F.desc("_votes"), F.asc(vote_col))),
        )
        .filter(F.col("_rn") == 1)
    )
    return ranked.select(
        *group_cols,
        F.when(
            F.col("_votes") / F.col("_total") > F.lit(threshold), F.col(vote_col)
        ).alias(out_col),
    )


def hierarchical_rollup(
    df: DataFrame,
    group_cols: Sequence[str],
    code_col: str,
    levels: Sequence[int] = (0, 2, 4, 6),
    threshold: float = 0.5,
    out_code: str = "rolled_code",
    out_level: str = "level",
) -> DataFrame:
    """ICB-style rollup: per group, truncate ``code_col`` by
    ``10^level`` (integer division) and pick the *finest* level whose
    modal truncated code holds a share > ``threshold``; groups where
    no level wins get NULL code/level.

    One shuffle: the per-(group, level, code) counts; level selection
    is two stacked windows. This is the Spark re-expression of the
    reference's per-document Python loop — semantically a ROLLUP over
    the code hierarchy with a custom level-select.
    """
    lv = F.explode(F.array(*[F.lit(int(x)) for x in levels])).alias("_lvl")
    exploded = df.select(*group_cols, F.col(code_col).alias("_code")).select(
        *group_cols, "_code", lv
    )
    coded = exploded.withColumn(
        "_rcode", F.floor(F.col("_code") / F.pow(F.lit(10.0), F.col("_lvl"))).cast("long")
    )
    counts = coded.groupBy(*group_cols, "_lvl", "_rcode").agg(
        F.count(F.lit(1)).alias("_votes")
    )
    wl = Window.partitionBy(*[F.col(c) for c in group_cols], F.col("_lvl"))
    best_per_level = (
        counts.withColumn("_total", F.sum("_votes").over(wl))
        .withColumn(
            "_rn", F.row_number().over(wl.orderBy(F.desc("_votes"), F.asc("_rcode")))
        )
        .filter((F.col("_rn") == 1) & (F.col("_votes") / F.col("_total") > F.lit(threshold)))
    )
    wg = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(F.asc("_lvl"))
    finest = (
        best_per_level.withColumn("_gr", F.row_number().over(wg))
        .filter(F.col("_gr") == 1)
        .select(
            *group_cols,
            F.col("_lvl").alias(out_level),
            F.col("_rcode").alias(out_code),
        )
    )
    all_groups = df.select(*group_cols).distinct()
    return all_groups.join(finest, on=list(group_cols), how="left")


def ttl_dedup(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    ttl_seconds: int = 604_800,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Rows accepted by a TTL'd history: keep a row iff the previous
    sighting of its key is absent or older than ``ttl_seconds``
    (renewal semantics; see module docstring). One shuffle on the key.
    """
    order = [F.col(time_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(*[F.col(c) for c in key_cols]).orderBy(*order)
    ms = epoch_ms(F.col(time_col))
    prev = F.lag(ms).over(w)
    return (
        df.withColumn("_prev_ms", prev)
        .filter(
            F.col("_prev_ms").isNull()
            | (ms - F.col("_prev_ms") >= F.lit(ttl_seconds * 1000))
        )
        .drop("_prev_ms")
    )


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k rows per group under a deterministic ordering (caller must
    include a tie-break key in ``order_by``)."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def anti_join_new(df: DataFrame, existing: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``df`` absent from ``existing`` (insert-if-absent)."""
    return df.join(existing, on=list(on), how="left_anti")


def semi_join_known(df: DataFrame, members: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``df`` whose key appears in ``members``."""
    return df.join(members, on=list(on), how="left_semi")


# --- gaps-and-islands streaks ---------------------------------------------

def consecutive_day_streaks(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Consecutive-day activity streaks per user — the classic
    gaps-and-islands rewrite: distinct active days, then
    ``day_number - row_number`` is constant within an island, so
    streak lengths fall out of a groupBy with NO self-join and no
    window-frame scan. Returns (user_col, n_streaks, max_streak,
    n_active_days), all BIGINT. Two key-bounded shuffles (the
    distinct and the window+aggs share the user partitioning)."""
    d = df.select(user_col, F.to_date(ts_col).alias("_day")).distinct()
    w = Window.partitionBy(user_col).orderBy("_day")
    r = d.select(
        user_col,
        (
            F.datediff(F.col("_day"), F.lit("2024-01-01").cast("date"))
            - F.row_number().over(w)
        ).alias("_grp"),
    )
    s = r.groupBy(user_col, "_grp").agg(
        F.count(F.lit(1)).cast("long").alias("_len")
    )
    return s.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
        F.max("_len").alias("max_streak"),
        F.sum("_len").cast("long").alias("n_active_days"),
    )


# --- CUSUM drift detection ------------------------------------------------

def cusum_scaled_deviation(df: DataFrame, ts_col: str) -> DataFrame:
    """Integer-scaled CUSUM over the hourly event rate:
    ``S_i = sum_{j<=i} (c_j * H - T)`` where H is the hour count and
    T the total — the cumulative deviation from the global mean,
    scaled by H so everything stays EXACT integers (no float mean).
    Returns one row per hour: (hour, c, s_scaled, n_hours, total).

    The cumulative window orders the AGGREGATED series (one row per
    hour — series-length bounded, not data bounded), so the single-
    ordering pass is over thousands of rows at any corpus size; the
    heavy lifting (hourly counts) is a partial-aggregated shuffle."""
    h = df.groupBy(F.date_trunc("hour", ts_col).alias("hour")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return cusum_from_hourly(h)


def cusum_from_hourly(h: DataFrame) -> DataFrame:
    """CUSUM fold over a prepared (hour, c) series — split out so the
    same detector runs on BATCH aggregates and on tables drained from
    a STREAMING window aggregation."""
    g = h.agg(
        F.count(F.lit(1)).cast("long").alias("n_hours"),
        F.sum("c").cast("long").alias("total"),
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    return h.crossJoin(F.broadcast(g)).withColumn(
        "s_scaled",
        F.sum(F.col("c") * F.col("n_hours") - F.col("total")).over(w).cast("long"),
    )


# --- event-time lateness audit --------------------------------------------

def lateness_audit(
    df: DataFrame, user_col: str, seq_col: str, ts_col: str
) -> DataFrame:
    """Per-key event-time lateness vs the running high-water mark in
    ARRIVAL order (``seq_col``, the ingest sequence) — the
    observability numbers behind choosing a streaming watermark
    delay. Returns (user_col, n_events, n_late, max_lateness_ms,
    total_lateness_ms), exact BIGINT ms. The running-max window is
    key-partitioned (scales with keys, no global ordering) and the
    final aggregate reuses the same exchange."""
    w = (
        Window.partitionBy(user_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o = df.select(user_col, seq_col, epoch_ms(ts_col).alias("_t")).withColumn(
        "_hwm", F.max("_t").over(w)
    )
    late = F.when(F.col("_t") < F.col("_hwm"), 1).otherwise(0)
    return o.groupBy(user_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(late).cast("long").alias("n_late"),
        F.max(F.col("_hwm") - F.col("_t")).cast("long").alias("max_lateness_ms"),
        F.sum(F.col("_hwm") - F.col("_t")).cast("long").alias("total_lateness_ms"),
    )


# --- sort-free exact rank selection ----------------------------------------

def exact_rank_values(
    df: DataFrame, value_col: str, ranks_df: DataFrame
) -> DataFrame:
    """EXACT k-th-smallest selection WITHOUT a global sort: integer
    bucket histogram (one shuffle, bounded by distinct buckets) ->
    cumulative counts over the bucket SERIES (series-length bounded,
    like the CUSUM fold) -> locate each requested rank's bucket ->
    collect-and-sort ONLY those buckets' members (bucket-population
    sized). A sort-based selection shuffles the whole column through
    one global ordering; this path shuffles it once as a histogram
    key and then touches only the hit buckets.

    ``ranks_df``: (rank_idx INT, rank_pos BIGINT), 1-indexed
    positions in ascending order of ``value_col``. Values must be
    finite (floor-bucketing is monotone for any sign). Skew caveat:
    a bucket holding a requested rank is collected into one
    aggregation buffer — under pathological value concentration,
    widen the bucket key (floor(x / w)) or recurse; documented, not
    hidden. Returns (rank_idx, rank_pos, value)."""
    b = df.select(
        F.floor(F.col(value_col)).cast("long").alias("_bkt"),
        F.col(value_col).alias("_v"),
    )
    hist = b.groupBy("_bkt").agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, 0)
    # NOTE (r11): the multiple consumers of `cum`/`target` below look
    # like repeated histogram passes, but they share canonicalized
    # Exchange subtrees and execute as ReusedExchange — a paired A/B
    # with an eager localCheckpoint(cum) here measured NO difference
    # at sf0.1 while adding non-replayable checkpoint blocks (an
    # executor-loss liability at scale). Left as pure lineage.
    cum = hist.withColumn("_cum", F.sum("_cnt").over(w)).withColumn(
        "_cum_prev", F.col("_cum") - F.col("_cnt")
    )
    target = cum.join(
        F.broadcast(ranks_df),
        (F.col("rank_pos") > F.col("_cum_prev"))
        & (F.col("rank_pos") <= F.col("_cum")),
    ).select("rank_idx", "rank_pos", "_bkt", "_cum_prev")
    needed = target.select("_bkt").distinct()
    arr = (
        b.join(F.broadcast(needed), "_bkt", "left_semi")
        .groupBy("_bkt")
        .agg(F.sort_array(F.collect_list("_v")).alias("_vs"))
    )
    return target.join(arr, "_bkt").select(
        "rank_idx",
        "rank_pos",
        F.element_at(
            "_vs", (F.col("rank_pos") - F.col("_cum_prev")).cast("int")
        ).alias("value"),
    )
# --- dense sequence IDs without a global sort ------------------------------

def dense_ids_by_key(
    df: DataFrame, key_col: str, num_parts: int | None = None
) -> DataFrame:
    """Assign contiguous 1..N ``seq_id`` in ``key_col`` order without
    the single-partition collapse of ``row_number() OVER (ORDER BY
    key)``: range-partition on the key (sampling-based boundary
    exchange — the same physical primitive a global sort uses, but
    with NO merge into one task afterwards), sort each partition
    locally, read off per-partition row numbers from
    ``monotonically_increasing_id`` (consecutive from 0 within a
    partition), then shift each partition by the exclusive prefix sum
    of partition COUNTS — a series bounded by the partition count,
    not the data.  The assigned ids depend only on the key order (the
    key must be unique), never on where the sampled boundaries fall.

    Every stage is parallel; the fact rows move through exactly one
    range exchange.  The broadcast side is num_parts rows."""
    # The counts branch and the probe branch both hang off the SAME
    # range exchange, which Catalyst deduplicates (ReusedExchange), so
    # both read identical shuffle output; above it, the local sort is
    # total (unique key) and mid assignment is a pure function of the
    # sorted partition — consistent across branches without pinning
    # the dataset in executor storage (a .persist() here leaked the
    # whole input for the session; r5 code-review finding).
    d = (
        df.repartitionByRange(num_parts or 32, F.col(key_col))
        .sortWithinPartitions(key_col)
        .withColumn("_mid", F.monotonically_increasing_id())
    )
    cnts = d.groupBy(F.shiftright("_mid", 33).alias("_pid")).agg(
        F.count(F.lit(1)).alias("_c"), F.min("_mid").alias("_base")
    )
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = cnts.select(
        "_pid", "_base", F.coalesce(F.sum("_c").over(w), F.lit(0)).alias("_off")
    )
    return (
        d.withColumn("_pid", F.shiftright("_mid", 33))
        .join(F.broadcast(offs), "_pid")
        .withColumn(
            "seq_id", F.col("_off") + (F.col("_mid") - F.col("_base")) + 1
        )
        .drop("_mid", "_pid", "_off", "_base")
    )


# --- interval coalescing (gaps-and-islands) --------------------------------

def coalesce_intervals(
    df: DataFrame, part_cols: list[str], start_col: str, end_col: str
) -> DataFrame:
    """Merge overlapping/touching [start, end) intervals within each
    partition key: an interval opens a new island iff its start lies
    strictly past the running max of all previous ends (the classic
    gaps-and-islands rewrite — one keyed shuffle, two frames over the
    key's own rows, never an interval self-join).  Returns one row
    per merged island: part_cols + (iv_start, iv_end)."""
    w = Window.partitionBy(*part_cols).orderBy(start_col, end_col)
    prev_max = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        prev_max.isNull() | (F.col(start_col) > prev_max), 1
    ).otherwise(0)
    isl = df.withColumn(
        "_island",
        F.sum(new_island).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return isl.groupBy(*part_cols, "_island").agg(
        F.min(start_col).alias("iv_start"), F.max(end_col).alias("iv_end")
    ).drop("_island")
