"""Time-series & linear-algebra surface: exponentially-weighted
smoothing with integer-exact weights, a fixed-point embedding scatter
matrix (the PCA/whitening front end), and Markov transition
probabilities over per-user event sequences.

Determinism notes (registry.py rules): EWMA weights are the integers
3^k * 4^(23-k), so every weighted sum is an exact BIGINT and only the
final division is float; the scatter matrix quantizes float32
components to floor(v * 2^20) fixed-point BIGINTs before any
cross-row accumulation (float reduce is non-associative; fixed-point
partial aggregation is the accumulation discipline a 1000-executor
reduce needs anyway); transition probabilities are integer count
ratios."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.dates import epoch_ms
from dss_nlp_ingestion_spark.plans.registry import (
    fround,
    fround_sql,
    register,
)

# ---------------------------------------------------------------------------
# EWMA smoothing of the hourly series (integer-exact weights)
# ---------------------------------------------------------------------------

_EWMA_ORACLE = f"""
WITH h AS (
  SELECT epoch_ms(ts) // 3600000 AS hb, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY hb
), p AS (
  SELECT x.hb, x.c,
         CAST(pow(3, l.k) * pow(4, 23 - l.k) AS BIGINT) AS w,
         y.c AS cy
  FROM h x
  JOIN (SELECT unnest(range(0, 24)) AS k) l ON true
  JOIN h y ON y.hb = x.hb - l.k
), s AS (
  SELECT hb, min(c) AS c,
         CAST(sum(w * cy) AS BIGINT) AS num,
         CAST(sum(w) AS BIGINT) AS den,
         CAST(count(*) AS BIGINT) AS n_lags
  FROM p GROUP BY hb
)
SELECT hb, c, n_lags,
       {fround_sql('CAST(num AS DOUBLE) / CAST(den AS DOUBLE)', 6)} AS ewma
FROM s
"""


@register("ewma_hourly_counts", _EWMA_ORACLE)
def ewma_hourly_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha=1/4, 24-hour
    memory) over the hourly event-count series — the smoothing pass
    behind rate alerting and forecast baselines.  The EWMA weights
    (3/4)^k are carried as the INTEGERS 3^k * 4^(23-k), so both
    weighted sums are exact BIGINTs regardless of aggregation order;
    one shared float division at the end (registry rule 2).  Hours
    absent from the series carry no weight (observed-hours
    normalization — the den sum).  Scale shape: one partial-agg
    shuffle to hours, then a constant 24x lag join on the
    calendar-bounded AGGREGATED series."""
    ev = table(spark, sf_dir, "events")
    h = (
        ev.select(F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb"))
        .groupBy("hb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    x = h.select(
        "hb", "c", F.explode(F.sequence(F.lit(0), F.lit(23))).alias("k")
    )
    y = h.select(F.col("hb").alias("hb2"), F.col("c").alias("cy"))
    p = x.join(y, F.col("hb") - F.col("k") == F.col("hb2")).select(
        "hb",
        "c",
        (F.pow(F.lit(3.0), F.col("k")) * F.pow(F.lit(4.0), 23 - F.col("k")))
        .cast("long")
        .alias("w"),
        "cy",
    )
    s = p.groupBy("hb").agg(
        F.min("c").alias("c"),
        F.sum(F.col("w") * F.col("cy")).cast("long").alias("num"),
        F.sum("w").cast("long").alias("den"),
        F.count(F.lit(1)).cast("long").alias("n_lags"),
    )
    return s.select(
        "hb",
        "c",
        "n_lags",
        fround(
            F.col("num").cast("double") / F.col("den").cast("double"), 6
        ).alias("ewma"),
    )


# ---------------------------------------------------------------------------
# Fixed-point embedding scatter matrix (PCA / whitening front end)
# ---------------------------------------------------------------------------

_SCATTER_ORACLE = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0)
                                  AS BIGINT)) AS qv
  FROM embeddings
), a AS (
  SELECT vec_id, i - 1 AS i, qv[i] AS vi
  FROM q, range(1, 65) t(i)
), p AS (
  SELECT a.i AS i, b.i AS j, a.vi * b.vi AS prod
  FROM a JOIN a b ON a.vec_id = b.vec_id AND a.i <= b.i
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(sum(prod) AS BIGINT) AS g_fixed
FROM p GROUP BY i, j
"""


@register("embedding_scatter_matrix", _SCATTER_ORACLE)
def embedding_scatter_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram/scatter matrix G = sum(v v^T) of the
    embedding corpus in 2^-20 fixed point — the input every PCA /
    whitening / OPQ rotation step consumes
    (operators/pca.py:power_iteration_top1 eigensolves the collected
    matrix; it is model-parameter-sized, d^2 = 4096 entries,
    regardless of corpus size).  Components quantize to
    floor(v * 2^20) BIGINTs BEFORE any cross-row sum, so partial
    aggregation order cannot perturb the result (float reduce is
    non-associative; this is the fixed-point accumulation a
    1000-executor tree reduce needs anyway — quantization error is
    bounded by 2^-20 * n per cell and auditable).  Scale shape: the
    d^2 blowup happens scan-side inside one stage (double posexplode,
    no self-join shuffle); the only exchange is the partial-aggregated
    rollup onto d^2 = 4096 keys."""
    emb = table(spark, sf_dir, "embeddings")
    q = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * F.lit(1048576.0)).cast(
                "long"
            ),
        ).alias("qv"),
    )
    a = q.select("vec_id", "qv", F.posexplode("qv").alias("i", "vi"))
    p = a.select("i", "vi", F.posexplode("qv").alias("j", "vj")).filter(
        F.col("i") <= F.col("j")
    )
    return (
        p.groupBy("i", "j")
        .agg(F.sum(F.col("vi") * F.col("vj")).cast("long").alias("g_fixed"))
        .select(
            F.col("i").cast("int").alias("i"),
            F.col("j").cast("int").alias("j"),
            "g_fixed",
        )
    )


# ---------------------------------------------------------------------------
# Markov transition probabilities over per-user event sequences
# ---------------------------------------------------------------------------

_TRANSITIONS_ORACLE = f"""
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), c AS (
  SELECT event_type AS cur_type, next_type,
         CAST(count(*) AS BIGINT) AS n
  FROM o WHERE next_type IS NOT NULL
  GROUP BY cur_type, next_type
), t AS (
  SELECT cur_type, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY cur_type
)
SELECT c.cur_type, c.next_type, c.n,
       {fround_sql('CAST(c.n AS DOUBLE) / t.total', 6)} AS p
FROM c JOIN t ON t.cur_type = c.cur_type
"""


@register("event_transition_probs", _TRANSITIONS_ORACLE)
def event_transition_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's
    time-ordered event stream: P(next | current) with integer counts
    and one final division — the behavioral model behind
    next-action prediction and bot detection.  One user-keyed
    shuffle for the lead(); the transition rollup is bounded by
    |event_type|^2.  Tie-break on (ts, event_id) keeps the sequence
    total, so both engines fold the identical ordering."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    c = o.groupBy(
        F.col("event_type").alias("cur_type"), "next_type"
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    t = c.groupBy("cur_type").agg(F.sum("n").cast("long").alias("total"))
    return c.join(F.broadcast(t), "cur_type").select(
        "cur_type",
        "next_type",
        "n",
        fround(F.col("n").cast("double") / F.col("total"), 6).alias("p"),
    )
