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

import os
import tempfile

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

# The 24 EWMA weights 3^k * 4^(23-k) as EXACT Python integers, shared
# verbatim by the Spark fold and the SQL oracle — libm pow differs in
# the last ulp across platforms and Spark's double->long cast
# truncates while DuckDB's rounds, so weights must never route
# through pow (r5 code-review finding).
_EWMA_WEIGHTS = [(k, 3**k * 4 ** (23 - k)) for k in range(24)]
_EWMA_W_SQL = ", ".join(f"({k}, {w})" for k, w in _EWMA_WEIGHTS)

_EWMA_ORACLE = f"""
WITH h AS (
  SELECT epoch_ms(ts) // 3600000 AS hb, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY hb
), p AS (
  SELECT x.hb, x.c, l.w, y.c AS cy
  FROM h x
  JOIN (SELECT * FROM (VALUES {_EWMA_W_SQL}) t(k, w)) l ON true
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
    return _ewma_fold(h)


def _ewma_fold(h: DataFrame) -> DataFrame:
    """The shared integer-weight EWMA fold over an (hb, c) hourly
    series — used identically by the batch query and the streaming
    drain twin, so stream==batch equality is arithmetic, not luck."""
    lags = F.broadcast(
        h.sparkSession.createDataFrame(_EWMA_WEIGHTS, "k int, w long")
    )
    x = h.crossJoin(lags)
    y = h.select(F.col("hb").alias("hb2"), F.col("c").alias("cy"))
    p = x.join(y, F.col("hb") - F.col("k") == F.col("hb2")).select(
        "hb", "c", "w", "cy"
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


# ---------------------------------------------------------------------------
# Incrementally-maintained scatter matrix over the tx-log change feed
# ---------------------------------------------------------------------------

_IVM_SCATTER_ORACLE = """
WITH live AS (
  SELECT vec_id AS rid,
         list_transform(embedding,
                        v -> CAST(floor(CAST(v AS DOUBLE) * 1048576.0)
                                  AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % 7 <> 3
), a AS (
  SELECT rid, i - 1 AS i, qv[i] AS vi
  FROM live, range(1, 65) t(i)
), p AS (
  SELECT a.i AS i, b.i AS j, a.vi * b.vi AS prod
  FROM a JOIN a b ON a.rid = b.rid AND a.i <= b.i
)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j,
       CAST(sum(prod) AS BIGINT) AS g_fixed
FROM p GROUP BY i, j
"""


def _fixed_outer(df: DataFrame, weight) -> DataFrame:
    """Scan-side fixed-point outer products: (i, j, w * vi * vj) for
    the upper triangle, from an ``embedding`` column and an integer
    per-row weight column/literal."""
    q = df.select(
        F.transform(
            "embedding",
            lambda v: F.floor(v.cast("double") * F.lit(1048576.0)).cast(
                "long"
            ),
        ).alias("qv"),
        weight.cast("long").alias("_w"),
    )
    a = q.select("qv", "_w", F.posexplode("qv").alias("i", "vi"))
    return a.select(
        "i", "vi", "_w", F.posexplode("qv").alias("j", "vj")
    ).filter(F.col("i") <= F.col("j")).select(
        "i", "j", (F.col("_w") * F.col("vi") * F.col("vj")).alias("prod")
    )


@register("ivm_scatter_matrix", _IVM_SCATTER_ORACLE)
def ivm_scatter_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for LINEAR ALGEBRA state: the
    fixed-point Gram matrix G = sum(v v^T) is built at v0 of an ACID
    embedding table, the table then takes an append AND a
    delete-rewrite, and G is brought to head by folding ONLY the
    signed change feed (inserted vectors add their outer product,
    deleted ones subtract — exact BIGINT fixed point, so subtraction
    is lossless; a float G could never be un-summed safely).  The
    oracle recomputes head G from scratch; the hash match proves
    base + delta == recompute.  At 100 TB the refresh cost per
    training batch is O(changed vectors) * d^2, not O(corpus) —
    the PCA/whitening front end stays current without rescans."""
    import os

    from dss_nlp_ingestion_spark.sources import txlog

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = tempfile.mkdtemp(prefix="dss_ivmscatter_") + "/emb"
    txlog.create_table(emb.filter(F.col("vec_id") % 10 < 8), path)
    txlog.append(emb.filter(F.col("vec_id") % 10 >= 8), path)
    live = txlog.snapshot_files(path, 1)
    rel = [os.path.relpath(f, os.path.join(path, "data")) for f in live]
    txlog.rewrite(
        txlog.read(spark, path, version=1).filter(F.col("vec_id") % 7 != 3),
        path,
        rel,
        expect_version=1,
        op="delete",
    )

    base = (
        _fixed_outer(txlog.read(spark, path, version=0), F.lit(1))
        .groupBy("i", "j")
        .agg(F.sum("prod").cast("long").alias("g0"))
    )
    feed = txlog.net_changes(spark, path, v_from=0)
    sign = F.when(F.col("change") == "insert", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        _fixed_outer(feed, sign * F.col("n"))
        .groupBy("i", "j")
        .agg(F.sum("prod").cast("long").alias("dg"))
    )
    head = base.join(delta, ["i", "j"], "full_outer").select(
        "i",
        "j",
        (
            F.coalesce(F.col("g0"), F.lit(0))
            + F.coalesce(F.col("dg"), F.lit(0))
        )
        .cast("long")
        .alias("g_fixed"),
    )
    return head.select(
        F.col("i").cast("int").alias("i"),
        F.col("j").cast("int").alias("j"),
        "g_fixed",
    )


# ---------------------------------------------------------------------------
# Frequent co-purchase triples (A-Priori step 3, basket-local)
# ---------------------------------------------------------------------------

_TRIPLES_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), t AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, c.l_partkey AS pc,
         CAST(count(*) AS BIGINT) AS support
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN items c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY pa, pb, pc
  HAVING count(*) >= 2
)
SELECT pa, pb, pc, support FROM t
ORDER BY support DESC, pa, pb, pc
LIMIT 100
"""


@register("copurchase_triples_support", _TRIPLES_ORACLE)
def copurchase_triples_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets: triples generated BASKET-LOCALLY (triple
    explode over each order's sorted item array, bounded by basket
    size choose 3 — never a 3-way fact self-join), one shuffle to
    count support.  Top-100 with a total (support, ids) order."""
    li = table(spark, sf_dir, "lineitem")
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("its"))
    )
    triples = (
        baskets.select(F.explode("its").alias("pa"), "its")
        .select("pa", F.explode("its").alias("pb"), "its")
        .filter(F.col("pa") < F.col("pb"))
        .select("pa", "pb", F.explode("its").alias("pc"))
        .filter(F.col("pb") < F.col("pc"))
        .groupBy("pa", "pb", "pc")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= 2)
    )
    return triples.orderBy(
        F.col("support").desc(), "pa", "pb", "pc"
    ).limit(100)


# ---------------------------------------------------------------------------
# Weekly exact percentile bands (grouped rank selection)
# ---------------------------------------------------------------------------

_WEEKLY_PCTL_ORACLE = """
WITH w AS (
  SELECT (epoch_ms(o_orderdate) // 86400000) // 7 AS wk,
         o_totalprice AS v, o_orderkey
  FROM orders
), r AS (
  SELECT wk, v,
         row_number() OVER (PARTITION BY wk ORDER BY v, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY wk) AS n
  FROM w
)
SELECT wk, CAST(min(n) AS BIGINT) AS n_orders,
       max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS p50,
       max(CASE WHEN rn = (9 * n + 9) // 10 THEN v END) AS p90
FROM r GROUP BY wk
"""


@register("weekly_price_percentiles", _WEEKLY_PCTL_ORACLE)
def weekly_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90 order-value bands per calendar week by POSITION
    selection (value at rank ceil(n/2) / ceil(9n/10)) — no
    interpolation, so cross-engine float parity is trivial; ties
    resolve by (value, key) total order but cannot change the
    selected VALUE.  One week-keyed shuffle; each group ranks only
    its own rows (parallel across the calendar — the grouped
    complement of the global sort-free selector)."""
    orders = table(spark, sf_dir, "orders")
    base = orders.select(
        F.floor(
            F.floor(epoch_ms("o_orderdate") / 86400000) / 7
        )
        .cast("long")
        .alias("wk"),
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
    )
    win = Window.partitionBy("wk").orderBy("v", "o_orderkey")
    r = base.select(
        "wk",
        "v",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("wk"))
        .alias("n"),
    )
    return r.groupBy("wk").agg(
        F.min("n").cast("long").alias("n_orders"),
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("v"))
        ).alias("p50"),
        F.max(
            F.when(
                F.col("rn") == F.floor((9 * F.col("n") + 9) / 10), F.col("v")
            )
        ).alias("p90"),
    )


# ---------------------------------------------------------------------------
# Streaming EWMA (stream -> hourly drain -> the same integer fold)
# ---------------------------------------------------------------------------


@register("streaming_ewma_hourly", _EWMA_ORACLE)
def streaming_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EWMA smoother wired to STREAMING ingest: file source ->
    watermarked hourly window aggregate -> availableNow drain into a
    memory sink -> the identical integer-weight fold
    (_ewma_fold) over the drained series.  Hash-gated against the
    batch oracle — stream and batch must agree to the last bit
    because every weight is an integer."""
    import tempfile as _tf

    from dss_nlp_ingestion_spark.streaming.pipeline import (
        read_events_stream,
        run_complete_available_now,
    )

    events = table(spark, sf_dir, "events")
    src = _tf.mkdtemp(prefix="dss_stream_ewma_")
    events.write.mode("overwrite").parquet(src)
    stream = read_events_stream(spark, src, schema=events.schema)
    hourly = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    run_complete_available_now(hourly, "dss_streaming_ewma_hours")
    h = spark.table("dss_streaming_ewma_hours").select(
        F.floor(epoch_ms("hour") / 3600000).cast("long").alias("hb"),
        "c",
    )
    return _ewma_fold(h)


# ---------------------------------------------------------------------------
# Session path mining (top entry paths)
# ---------------------------------------------------------------------------

_PATHS_ORACLE = """
WITH o AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id,
         CASE WHEN epoch_ms(ts)
                   - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                   > 1800000
              OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, event_type, ms, event_id,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess
  FROM o
), r AS (
  SELECT user_id, sess, event_type,
         row_number() OVER (PARTITION BY user_id, sess
                            ORDER BY ms, event_id) AS rn
  FROM s
), p AS (
  SELECT user_id, sess,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY user_id, sess
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM p GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@register("session_paths_topk", _PATHS_ORACLE)
def session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common session ENTRY paths (first three event types per
    30-minute-gap session) — the navigation-mining rollup behind
    onboarding and landing-flow analysis.  Gap sessionization is the
    gaps-and-islands fold (one user-keyed shuffle); paths assemble
    from a sorted struct array inside the row, so the concatenation
    order is total (ms, event_id) on both engines."""
    ev = table(spark, sf_dir, "events")
    base = ev.select(
        "user_id", "event_type", epoch_ms("ts").alias("ms"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    prev = F.lag("ms").over(w)
    brk = F.when(
        prev.isNull() | (F.col("ms") - prev > 1800000), 1
    ).otherwise(0)
    s = base.withColumn(
        "sess", F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    r = s.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("user_id", "sess").orderBy("ms", "event_id")
        ),
    ).filter(F.col("rn") <= 3)
    p = r.groupBy("user_id", "sess").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        p.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Bitemporal as-of (transaction time x valid time)
# ---------------------------------------------------------------------------

_BITEMPORAL_ORACLE = """
WITH src AS (
  SELECT user_id, event_type AS attr, epoch_ms(ts) AS from_ms, event_id
  FROM events WHERE event_id % 5 <> 0
), iv AS (
  SELECT user_id, attr, from_ms,
         lead(from_ms) OVER (PARTITION BY user_id
                             ORDER BY from_ms, event_id) AS to_ms,
         CAST(row_number() OVER (PARTITION BY user_id
                                 ORDER BY from_ms, event_id) AS BIGINT)
           AS rev
  FROM src
), t AS (
  SELECT (min(from_ms) + max(from_ms)) // 2 AS vt FROM src
)
SELECT iv.user_id, iv.attr, iv.from_ms, iv.rev
FROM iv CROSS JOIN t
WHERE iv.from_ms <= t.vt AND (iv.to_ms IS NULL OR iv.to_ms > t.vt)
"""


@register("bitemporal_asof_dimension", _BITEMPORAL_ORACLE)
def bitemporal_asof_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL read: "the dimension as we KNEW it at transaction
    version 0, as of valid time T".  The SCD2 dimension (validity
    intervals from the change feed) is committed to an ACID tx-log
    table at v0 from the then-known feed (event_id % 5 != 0 —
    the late 20% hasn't arrived), then REBUILT at v1 with the full
    feed; the query time-travels to v0 (sources/txlog.py read
    version=0 — the v1 rebuild must NOT leak in) and point-in-time
    filters at the valid midpoint.  The oracle replays the v0 build
    directly.  This is the audit query every regulated pipeline
    needs: reproduce yesterday's answer including what we didn't yet
    know."""
    import os as _os
    import tempfile as _tf

    from dss_nlp_ingestion_spark.sources import txlog

    def _scd2(feed: DataFrame) -> DataFrame:
        w = Window.partitionBy("user_id").orderBy("from_ms", "event_id")
        return feed.select(
            "user_id",
            "attr",
            "from_ms",
            F.lead("from_ms").over(w).alias("to_ms"),
            F.row_number().over(w).cast("long").alias("rev"),
        )

    ev = table(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("attr"),
        epoch_ms("ts").alias("from_ms"),
        "event_id",
    )
    known_v0 = ev.filter(F.col("event_id") % 5 != 0)
    path = _tf.mkdtemp(prefix="dss_bitemporal_") + "/dim"
    txlog.create_table(_scd2(known_v0), path)
    live = txlog.snapshot_files(path, 0)
    rel = [_os.path.relpath(f, _os.path.join(path, "data")) for f in live]
    txlog.rewrite(_scd2(ev), path, rel, expect_version=0, op="rebuild")

    vt = known_v0.agg(
        ((F.min("from_ms") + F.max("from_ms")) / 2)
        .cast("long")
        .alias("vt")
    )
    dim_v0 = txlog.read(spark, path, version=0)
    return (
        dim_v0.crossJoin(F.broadcast(vt))
        .filter(
            (F.col("from_ms") <= F.col("vt"))
            & (F.col("to_ms").isNull() | (F.col("to_ms") > F.col("vt")))
        )
        .select("user_id", "attr", "from_ms", "rev")
    )


# ---------------------------------------------------------------------------
# DAU/WAU stickiness (coverage-explode sliding distinct at day grain)
# ---------------------------------------------------------------------------

_STICKINESS_ORACLE = f"""
WITH e AS (
  SELECT epoch_ms(ts) // 86400000 AS day, user_id FROM events
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau FROM e GROUP BY day
), cov AS (
  SELECT DISTINCT e.day + k AS wday, user_id
  FROM e, (SELECT unnest(range(0, 7)) AS k)
), wau AS (
  SELECT wday AS day, CAST(count(*) AS BIGINT) AS wau
  FROM cov GROUP BY wday
)
SELECT dau.day, dau.dau, wau.wau,
       {fround_sql('CAST(dau.dau AS DOUBLE) / wau.wau', 6)} AS stickiness
FROM dau JOIN wau ON wau.day = dau.day
"""


@register("dau_wau_stickiness", _STICKINESS_ORACLE)
def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU "stickiness" per day: daily actives over the EXACT
    7-day trailing distinct actives, computed by the coverage-explode
    rewrite (each active-day lands in the 7 windows ending on it — a
    constant 7x blowup of the already-deduplicated (day, user)
    pairs, then one distinct + count).  Only days that actually have
    activity are reported (inner join).  Two key-bounded shuffles;
    integer day arithmetic shared verbatim with the oracle."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        F.floor(epoch_ms("ts") / 86400000).cast("long").alias("day"),
        "user_id",
    )
    dau = e.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    cov = (
        e.select(
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"),
            "day",
            "user_id",
        )
        .select((F.col("day") + F.col("k")).alias("wday"), "user_id")
        .distinct()
    )
    wau = cov.groupBy(F.col("wday").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("wau")
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        fround(F.col("dau").cast("double") / F.col("wau"), 6).alias(
            "stickiness"
        ),
    )


# ---------------------------------------------------------------------------
# IQR outlier fences per market segment (grouped position selection)
# ---------------------------------------------------------------------------

_IQR_ORACLE = """
WITH o AS (
  SELECT c.c_mktsegment AS seg, o.o_totalprice AS v, o.o_orderkey
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), r AS (
  SELECT seg, v,
         row_number() OVER (PARTITION BY seg ORDER BY v, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY seg) AS n
  FROM o
), q AS (
  SELECT seg,
         max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS q1,
         max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS q3
  FROM r GROUP BY seg
)
SELECT o.seg, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN o.v > q.q3 + 3 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_outliers,
       q.q1, q.q3
FROM o JOIN q ON q.seg = o.seg
GROUP BY o.seg, q.q1, q.q3
"""


@register("iqr_outlier_orders", _IQR_ORACLE)
def iqr_outlier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per market segment: exact Q1/Q3 by
    POSITION selection within each segment (ranks ceil(n/4),
    ceil(3n/4) — no interpolation, no cross-engine float hazard),
    fences at Q3 + 3*IQR, one rollup counting exceedances.  The
    fence comparison is pure arithmetic on selected data values.
    Scale shape: segment-keyed windows (parallel across segments),
    a 5-row fence broadcast back onto the facts."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_totalprice").alias("v"),
        "o_orderkey",
    )
    win = Window.partitionBy("seg").orderBy("v", "o_orderkey")
    r = o.select(
        "seg",
        "v",
        F.row_number().over(win).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("seg")).alias("n"),
    )
    q = r.groupBy("seg").agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 3) / 4), F.col("v"))
        ).alias("q1"),
        F.max(
            F.when(
                F.col("rn") == F.floor((3 * F.col("n") + 3) / 4), F.col("v")
            )
        ).alias("q3"),
    )
    return (
        o.join(F.broadcast(q), "seg")
        .groupBy("seg", "q1", "q3")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(
                F.when(
                    F.col("v") > F.col("q3") + 3 * (F.col("q3") - F.col("q1")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_high_outliers"),
        )
        .select("seg", "n_orders", "n_high_outliers", "q1", "q3")
    )


# ---------------------------------------------------------------------------
# Burstiness (Fano factor) per event type
# ---------------------------------------------------------------------------

_BURSTINESS_ORACLE = f"""
WITH h AS (
  SELECT event_type, epoch_ms(ts) // 3600000 AS hb,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY event_type, hb
), s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(c) AS BIGINT) AS sc,
         CAST(sum(c * c) AS BIGINT) AS scc
  FROM h GROUP BY event_type
)
SELECT event_type, n AS n_hours, sc AS n_events,
       {fround_sql('CAST(n * scc - sc * sc AS DOUBLE) / (CAST(n AS DOUBLE) * sc)', 6)}
         AS fano
FROM s
"""


@register("event_burstiness", _BURSTINESS_ORACLE)
def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean ratio of hourly counts) per
    event type — the burstiness diagnostic separating Poisson-like
    traffic (fano ~= 1) from bursty bot/incident traffic (fano >> 1).
    Moments are exact BIGINTs; fano = (n*scc - sc^2) / (n * sc) in
    one shared double expression.  One partial-agg shuffle to
    (type, hour), one to type."""
    ev = table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb"),
        )
        .groupBy("event_type", "hb")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    s = h.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("sc"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("scc"),
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("sc").alias("n_events"),
        fround(
            (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc")).cast(
                "double"
            )
            / (F.col("n").cast("double") * F.col("sc")),
            6,
        ).alias("fano"),
    )


# ---------------------------------------------------------------------------
# Multi-table atomic transaction snapshot
# ---------------------------------------------------------------------------

_MULTITXN_ORACLE = """
WITH o AS (
  SELECT * FROM orders WHERE o_orderkey % 3 <> 0
), l AS (
  SELECT * FROM lineitem WHERE l_orderkey % 3 <> 0
)
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM o JOIN l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@register("multitable_txn_snapshot", _MULTITXN_ORACLE)
def multitable_txn_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table ATOMIC visibility: orders and lineitem are
    separate ACID tables; batch 1 (orderkey % 3 != 0) commits to
    both and publishes txn0; batch 2's ORDERS append then commits
    (orders v1) while its lineitem half is still in flight — the
    dual-write window every orders@head JOIN lineitem@head reader
    tears in.  The query reads the txn0 CONSISTENT vector
    (sources/multitxn.py — per-table time travel at the pinned
    versions), so the half-ingested batch is invisible and the join
    balances.  The oracle replays batch 1 only; the pytest twin
    asserts the torn head-read actually differs."""
    from dss_nlp_ingestion_spark.sources import multitxn, txlog

    orders = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    root = tempfile.mkdtemp(prefix="dss_multitxn_")
    txlog.create_table(
        orders.filter(F.col("o_orderkey") % 3 != 0),
        os.path.join(root, "orders"),
    )
    txlog.create_table(
        li.filter(F.col("l_orderkey") % 3 != 0),
        os.path.join(root, "lineitem"),
    )
    txn0 = multitxn.commit_txn(root, {"orders": 0, "lineitem": 0})
    # batch 2: orders half lands; lineitem half is "in flight"
    txlog.append(
        orders.filter(F.col("o_orderkey") % 3 == 0),
        os.path.join(root, "orders"),
    )
    snap = multitxn.read_consistent(spark, root, txn0)
    o, l = snap["orders"], snap["lineitem"]
    return (
        o.join(l, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# SLO burn rate over sliding windows
# ---------------------------------------------------------------------------

_SLO_ORACLE = f"""
WITH e AS (
  SELECT epoch_ms(ts) // 3600000 AS hb,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events
), cov AS (
  SELECT hb + k AS whb, is_err
  FROM e, (SELECT unnest(range(0, 6)) AS k)
), w AS (
  SELECT whb, CAST(count(*) AS BIGINT) AS total,
         CAST(sum(is_err) AS BIGINT) AS errs
  FROM cov GROUP BY whb
)
SELECT whb AS window_end_hb, total, errs,
       {fround_sql('CAST(errs AS DOUBLE) / total', 6)} AS err_rate,
       CAST(CASE WHEN errs * 5 > total THEN 1 ELSE 0 END AS BIGINT)
         AS burn_alert
FROM w
"""


@register("slo_burn_rate", _SLO_ORACLE)
def slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-budget burn over 6-hour trailing windows sliding by
    hour: the coverage-explode rewrite (constant 6x blowup) gives
    exact windowed error rates, and the alert fires on the INTEGER
    inequality errs*5 > total (rate > 20%) — no float threshold, so
    the alert set is bit-exact.  Ratio reported for humans via the
    shared rounding."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb"),
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
    )
    cov = e.select(
        F.explode(F.sequence(F.lit(0), F.lit(5))).alias("k"), "hb", "is_err"
    ).select((F.col("hb") + F.col("k")).alias("whb"), "is_err")
    w = cov.groupBy("whb").agg(
        F.count(F.lit(1)).cast("long").alias("total"),
        F.sum("is_err").cast("long").alias("errs"),
    )
    return w.select(
        F.col("whb").alias("window_end_hb"),
        "total",
        "errs",
        fround(F.col("errs").cast("double") / F.col("total"), 6).alias(
            "err_rate"
        ),
        F.when(F.col("errs") * 5 > F.col("total"), 1)
        .otherwise(0)
        .cast("long")
        .alias("burn_alert"),
    )


# ---------------------------------------------------------------------------
# Post-stratified estimation from a biased hash sample
# ---------------------------------------------------------------------------

_POSTSTRAT_ORACLE = f"""
WITH o AS (
  SELECT c.c_mktsegment AS seg,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         (('0x' || substr(sha256('pstrat:' || CAST(o.o_orderkey AS VARCHAR)),
                          1, 13))::BIGINT) AS h
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
), s AS (
  SELECT seg, cents,
         CASE WHEN h < CASE WHEN seg = 'BUILDING'
                            THEN {int(0.10 * (1 << 52))}
                            ELSE {int(0.30 * (1 << 52))} END
              THEN 1 ELSE 0 END AS in_sample
  FROM o
), g AS (
  SELECT seg,
         CAST(count(*) AS BIGINT) AS big_n,
         CAST(sum(in_sample) AS BIGINT) AS n_sampled,
         CAST(sum(CASE WHEN in_sample = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS sampled_cents,
         CAST(sum(cents) AS BIGINT) AS true_cents
  FROM s GROUP BY seg
)
SELECT seg, big_n, n_sampled, true_cents,
       {fround_sql(
           'CAST(sampled_cents AS DOUBLE) * big_n / n_sampled / 100.0', 2
       )} AS estimated_total
FROM g WHERE n_sampled > 0
"""


@register("post_stratified_estimate", _POSTSTRAT_ORACLE)
def post_stratified_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified (Horvitz-Thompson-style) revenue estimation
    from a DELIBERATELY biased hash sample: BUILDING orders sample at
    10%, everything else at 30% (membership is the deterministic
    52-bit sha256 fraction — reruns pick the same rows), then each
    stratum reweights by N_seg/n_seg so the estimate is unbiased
    despite the unequal rates.  The oracle and the estimate share
    exact integer counts/sums; one float expression at the end.
    This is the correction step every sampled-telemetry pipeline
    needs before summing to population totals."""
    from dss_nlp_ingestion_spark.operators.sampling import hash_order_key

    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = orders.join(
        F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        hash_order_key(F.col("o_orderkey"), "pstrat").alias("h"),
    )
    thresh = F.when(
        F.col("seg") == "BUILDING", F.lit(int(0.10 * (1 << 52)))
    ).otherwise(F.lit(int(0.30 * (1 << 52))))
    s = o.select(
        "seg",
        "cents",
        F.when(F.col("h") < thresh, 1).otherwise(0).alias("in_sample"),
    )
    g = s.groupBy("seg").agg(
        F.count(F.lit(1)).cast("long").alias("big_n"),
        F.sum("in_sample").cast("long").alias("n_sampled"),
        F.sum(
            F.when(F.col("in_sample") == 1, F.col("cents")).otherwise(0)
        )
        .cast("long")
        .alias("sampled_cents"),
        F.sum("cents").cast("long").alias("true_cents"),
    )
    return g.filter(F.col("n_sampled") > 0).select(
        "seg",
        "big_n",
        "n_sampled",
        "true_cents",
        fround(
            F.col("sampled_cents").cast("double")
            * F.col("big_n")
            / F.col("n_sampled")
            / F.lit(100.0),
            2,
        ).alias("estimated_total"),
    )


# ---------------------------------------------------------------------------
# Capture-recapture (Lincoln-Petersen) population estimate
# ---------------------------------------------------------------------------

_CAPTURE_ORACLE = f"""
WITH u AS (
  SELECT DISTINCT user_id FROM events
), m AS (
  SELECT user_id,
         CASE WHEN (('0x' || substr(sha256('capA:' || CAST(user_id AS VARCHAR)),
                     1, 13))::BIGINT) < {int(0.4 * (1 << 52))}
              THEN 1 ELSE 0 END AS in_a,
         CASE WHEN (('0x' || substr(sha256('capB:' || CAST(user_id AS VARCHAR)),
                     1, 13))::BIGINT) < {int(0.4 * (1 << 52))}
              THEN 1 ELSE 0 END AS in_b
  FROM u
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true,
         CAST(sum(in_a) AS BIGINT) AS na,
         CAST(sum(in_b) AS BIGINT) AS nb,
         CAST(sum(in_a * in_b) AS BIGINT) AS overlap
  FROM m
)
SELECT n_true, na, nb, overlap,
       {fround_sql('CAST(na AS DOUBLE) * nb / overlap', 2)} AS n_hat
FROM g WHERE overlap > 0
"""


@register("capture_recapture_estimate", _CAPTURE_ORACLE)
def capture_recapture_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lincoln-Petersen capture-recapture: two INDEPENDENT
    deterministic hash samples of the user population (different
    salts -> independent membership), population estimate
    N^ = nA*nB/overlap next to the true count — the estimator used
    to size populations only observable through overlapping partial
    views (two crawlers, two log pipelines).  Both samples are pure
    scan-side predicates; the whole query is one aggregate."""
    from dss_nlp_ingestion_spark.operators.sampling import hash_order_key

    ev = table(spark, sf_dir, "events")
    u = ev.select("user_id").distinct()
    lim = F.lit(int(0.4 * (1 << 52)))
    m = u.select(
        F.when(hash_order_key(F.col("user_id"), "capA") < lim, 1)
        .otherwise(0)
        .alias("in_a"),
        F.when(hash_order_key(F.col("user_id"), "capB") < lim, 1)
        .otherwise(0)
        .alias("in_b"),
    )
    g = m.agg(
        F.count(F.lit(1)).cast("long").alias("n_true"),
        F.sum("in_a").cast("long").alias("na"),
        F.sum("in_b").cast("long").alias("nb"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("overlap"),
    )
    return g.filter(F.col("overlap") > 0).select(
        "n_true",
        "na",
        "nb",
        "overlap",
        fround(
            F.col("na").cast("double") * F.col("nb") / F.col("overlap"), 2
        ).alias("n_hat"),
    )
