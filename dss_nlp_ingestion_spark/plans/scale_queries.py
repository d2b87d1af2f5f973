"""Physical-layout & series scale surface: zero-exchange bucketed
joins, global-sort-free dense ID assignment, interval coalescing, and
integer-exact autocorrelation.

The reference ingests into ES/Mongo and never co-locates joins
(src/res/models/datamodels.py bulk writers); on Spark the same
pipelines get layout control for free — bucketed tables remove the
per-join fact shuffle entirely, and range-partitioned ID assignment
replaces the single-partition ``row_number() OVER (ORDER BY ...)``
collapse that kills global sequence numbering at corpus scale.

Determinism notes (registry.py rules): bucketing changes the physical
plan only, so the bucketed join's oracle is the plain join SQL; dense
ids are a rank over a UNIQUE key (partition-boundary independent);
interval arithmetic is integer ms; ACF sums are exact BIGINTs with
one shared closed-form double expression at the end.
"""

from __future__ import annotations

import hashlib
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.dates import epoch_ms
from dss_nlp_ingestion_spark.operators.relational import (
    coalesce_intervals,
    dense_ids_by_key,
)
from dss_nlp_ingestion_spark.plans.registry import (
    dsum_sql,
    fround,
    fround_sql,
    register,
)

# ---------------------------------------------------------------------------
# Zero-exchange bucketed sort-merge join
# ---------------------------------------------------------------------------

_BUCKETED_ORACLE = f"""
SELECT c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       {dsum_sql('o.o_totalprice')} AS revenue
FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
"""


def _bucketed_tag(sf_dir: str) -> str:
    return hashlib.sha256(sf_dir.encode()).hexdigest()[:10]


def bucketed_join_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[DataFrame, DataFrame]:
    """Write ``customer`` and ``orders`` as bucketed+sorted tables on
    the join key and return the catalog-backed scans.  Both sides
    hash into the same ``n_buckets`` on custkey, so a sort-merge join
    between them needs NO Exchange on either side (plan-asserted in
    tests/test_explain_plans.py) — at 100 TB this is the difference
    between shuffling the fact table on every join and shuffling it
    once at layout time, amortized over every subsequent join on the
    same key.  Fault story: bucket files are written once per
    (sf_dir, layout) tag and reused; `mode("overwrite")` keeps the
    write idempotent."""
    tag = _bucketed_tag(sf_dir)
    base = f"{tempfile.gettempdir()}/dss_bucketed_{tag}"
    tc, to = f"bj_customer_{tag}", f"bj_orders_{tag}"
    if not (
        spark.catalog.tableExists(tc) and spark.catalog.tableExists(to)
    ):
        (
            table(spark, sf_dir, "customer")
            .repartition(n_buckets, "c_custkey")
            .write.bucketBy(n_buckets, "c_custkey")
            .sortBy("c_custkey")
            .option("path", f"{base}/customer")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(tc)
        )
        (
            table(spark, sf_dir, "orders")
            .repartition(n_buckets, "o_custkey")
            .write.bucketBy(n_buckets, "o_custkey")
            .sortBy("o_custkey")
            .option("path", f"{base}/orders")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(to)
        )
    return spark.table(tc), spark.table(to)


@register("bucketed_join_segments", _BUCKETED_ORACLE)
def bucketed_join_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per market segment through a BUCKETED sort-merge join:
    both tables are laid out bucketed+sorted on custkey, so the join
    reads co-located buckets with zero Exchange (the `merge` hint
    pins SMJ so tiny-sf broadcast doesn't mask the layout path; the
    result is identical either way, which is what the oracle
    checks).  The only shuffle in the whole query is the final tiny
    segment rollup."""
    cust, orders = bucketed_join_tables(spark, sf_dir)
    j = cust.hint("merge").join(
        orders.hint("merge"),
        cust["c_custkey"] == orders["o_custkey"],
    )
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Dense sequence IDs without a global sort
# ---------------------------------------------------------------------------

_DENSE_IDS_ORACLE = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS seq_id
FROM orders
"""


@register("dense_ids_orders", _DENSE_IDS_ORACLE)
def dense_ids_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous 1..N sequence IDs in o_orderkey order WITHOUT the
    single-partition collapse of ``row_number() OVER (ORDER BY ...)``
    (operators/relational.py:dense_ids_by_key — range exchange +
    local sort + partition-count offsets; every stage parallel).
    The oracle is the textbook single-partition window, so the
    distributed path is verified against the sequential definition."""
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    return dense_ids_by_key(orders, "o_orderkey", num_parts=8).select(
        "o_orderkey", F.col("seq_id").cast("long").alias("seq_id")
    )


# ---------------------------------------------------------------------------
# Interval coalescing (gaps-and-islands over activity windows)
# ---------------------------------------------------------------------------

_INTERVALS_ORACLE = """
WITH iv AS (
  SELECT user_id, epoch_ms(ts) AS s, epoch_ms(ts) + 900000 AS e
  FROM events
), m AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
), isl AS (
  SELECT user_id, s, e,
         sum(CASE WHEN prev_max IS NULL OR s > prev_max THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS island
  FROM m
), g AS (
  SELECT user_id, island, min(s) AS st, max(e) AS en
  FROM isl GROUP BY user_id, island
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(en - st) AS BIGINT) AS covered_ms
FROM g GROUP BY user_id
"""


@register("merged_activity_intervals", _INTERVALS_ORACLE)
def merged_activity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce each user's overlapping 15-minute activity intervals
    (gaps-and-islands) and report interval count + total covered
    wall-clock ms — the session-coverage metric rate limiters and
    billing pipelines need.  One user-keyed shuffle; the running-max
    island detection is a frame over the user's own rows
    (operators/relational.py:coalesce_intervals)."""
    ev = table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        epoch_ms("ts").alias("s"),
        (epoch_ms("ts") + F.lit(900000)).alias("e"),
    )
    g = coalesce_intervals(iv, ["user_id"], "s", "e")
    return g.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.sum(F.col("iv_end") - F.col("iv_start"))
        .cast("long")
        .alias("covered_ms"),
    )


# ---------------------------------------------------------------------------
# Hourly autocorrelation (integer-exact ACF)
# ---------------------------------------------------------------------------

_ACF_CORR = (
    "(CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) / "
    "sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"
)

_ACF_ORACLE = f"""
WITH h AS (
  SELECT epoch_ms(ts) // 3600000 AS hb, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY hb
), p AS (
  SELECT l.lag, x.c AS cx, y.c AS cy
  FROM h x
  JOIN (SELECT unnest(range(1, 7)) AS lag) l ON true
  JOIN h y ON y.hb = x.hb + l.lag
), s AS (
  SELECT lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cx) AS BIGINT) AS sx, CAST(sum(cy) AS BIGINT) AS sy,
         CAST(sum(cx * cy) AS BIGINT) AS sxy,
         CAST(sum(cx * cx) AS BIGINT) AS sxx,
         CAST(sum(cy * cy) AS BIGINT) AS syy
  FROM p GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag, n AS n_pairs,
       {fround_sql(_ACF_CORR, 6)} AS acf
FROM s
"""


@register("hourly_acf_lags", _ACF_ORACLE)
def hourly_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series at lags 1-6 —
    the seasonality diagnostic behind anomaly thresholds and forecast
    model selection.  All moment sums are exact BIGINTs over the
    (calendar-bounded) hourly series; the single closed-form Pearson
    expression at the end is the same IEEE double arithmetic in both
    engines (registry rule 2).  Scale shape: one partial-aggregated
    shuffle on hour buckets; the lag self-join runs on the AGGREGATED
    series, bounded by calendar hours, not event volume."""
    ev = table(spark, sf_dir, "events")
    h = (
        ev.select(F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    x = h.select(
        "hb",
        F.col("c").alias("cx"),
        F.explode(F.sequence(F.lit(1), F.lit(6))).alias("lag"),
    )
    y = h.select(F.col("hb").alias("hb2"), F.col("c").alias("cy"))
    p = x.join(y, F.col("hb") + F.col("lag") == F.col("hb2"))
    s = p.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cx").cast("long").alias("sx"),
        F.sum("cy").cast("long").alias("sy"),
        F.sum(F.col("cx") * F.col("cy")).cast("long").alias("sxy"),
        F.sum(F.col("cx") * F.col("cx")).cast("long").alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).cast("long").alias("syy"),
    )
    num = F.col("n").cast("double") * F.col("sxy") - F.col("sx").cast(
        "double"
    ) * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        fround(num / den, 6).alias("acf"),
    )
