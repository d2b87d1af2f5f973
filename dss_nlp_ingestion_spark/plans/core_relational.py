"""Core relational query plans (SURVEY.md §2.3–§2.8, §7.2 flagship).

Each query is the Spark-first re-expression of a reference dataflow
operation (citations in docstrings); the paired oracle is the ANSI-SQL
DuckDB runs on the same parquet views for the driver's correctness
gate. Determinism rules: see ``registry`` module docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.operators.relational import (
    anti_join_new,
    hierarchical_rollup,
    majority_vote,
    semi_join_known,
    topk_per_group,
    ttl_dedup,
)
from dss_nlp_ingestion_spark.plans.registry import (
    dsum,
    dsum_sql,
    fround,
    fround_sql,
    register,
    register_split,
)

# ---------------------------------------------------------------------------
# Flagship (SURVEY.md §7.2): documents -> short-text gate -> exact dedup
# -> per-(source, lang) profile. Mirrors the reference's reason to
# exist (normalize -> dedup -> aggregate; src/base.py:254-304).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, lang, n_chars,
         sha256(text) AS text_sha,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
), gated AS (
  SELECT * FROM toks WHERE n_tokens > 5
), deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY text_sha ORDER BY doc_id) AS rn
    FROM gated
  ) WHERE rn = 1
)
SELECT source, lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       {fround_sql('CAST(sum(n_chars) AS DOUBLE) / count(*)', 4)} AS avg_chars
FROM deduped
GROUP BY source, lang
"""


@register("flagship_doc_profile", _FLAGSHIP_ORACLE)
def flagship_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: short-text gate (general_utils.py:202-206) -> exact
    content dedup via sha2 (replacing Python hash, newsfilter.py:167)
    -> per-collection profile (the per-source Mongo collections,
    configs.yaml:11-42)."""
    return _flagship_body(table(spark, sf_dir, "documents"))


def _flagship_body(docs: DataFrame) -> DataFrame:
    """The flagship dataflow over any ``documents`` relation — shared
    by the raw-parquet and txlog-backed entries so the two can never
    drift."""
    toks = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias("n_tokens"),
    )
    gated = toks.filter(F.col("n_tokens") > 5)
    w = Window.partitionBy("text_sha").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        fround(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 4).alias("avg_chars"),
    )


def _flagship_txlog_setup(spark: SparkSession, sf_dir: str):
    """SETUP: materialize ``documents`` as a transaction-log table
    (doc_id stats logged per file) and route the catalog's
    ``documents`` resolution through it — the lakehouse-default store
    SCALE.md calls for (per-query directory LISTing does not survive
    100 TB; the log fold + logged-stats pruning does)."""
    import tempfile

    from dss_nlp_ingestion_spark.sources import txlog

    docs = table(spark, sf_dir, "documents")
    path = tempfile.mkdtemp(prefix="dss_docstore_") + "/documents"
    txlog.create_table(
        docs.repartitionByRange(8, "doc_id"), path, stats_cols=["doc_id"]
    )
    # The catalog override itself is installed by the PROBE, so the
    # process-global mutation and its cleanup live in one function —
    # a crash between setup and probe must not leave every later
    # 'documents' resolution silently redirected (r6 advisor finding).
    return sf_dir, path


def _flagship_txlog_probe(spark: SparkSession, ctx) -> DataFrame:
    """PROBE — the flagship profile with ``documents`` resolved
    through the tx table's snapshot (catalog.set_txlog_table): same
    plan shape as ``flagship_doc_profile`` (the file list is handed
    to the parquet reader, so pushdown/pruning still apply — the
    pruning effect itself is plan-locked in tests/test_txlog.py).
    The catalog override is popped once the plan is built: snapshot
    resolution happens at plan time, exactly like Delta/Iceberg."""
    from dss_nlp_ingestion_spark import catalog

    sf_dir, path = ctx
    try:
        catalog.set_txlog_table("documents", path)
        return _flagship_body(table(spark, sf_dir, "documents"))
    finally:
        catalog.clear_txlog_table("documents")


register_split(
    "flagship_doc_profile_txlog",
    _flagship_txlog_setup,
    _flagship_txlog_probe,
    _FLAGSHIP_ORACLE,
)


# ---------------------------------------------------------------------------
# TPC-H-shaped aggregation: scan -> filter -> groupBy with exact
# decimal partial aggregation (map-side combine; one shuffle).
# ---------------------------------------------------------------------------

_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
       {fround_sql(dsum_sql('l_quantity') + ' / count(*)', 4)} AS avg_qty,
       {fround_sql(dsum_sql('l_extendedprice') + ' / count(*)', 4)} AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("q1_pricing_summary", _Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the engine's headline scan+agg (partial
    aggregation keeps the shuffle tiny at 100 TB; decimal sums keep the
    result order-independent)."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity")).alias("sum_qty"),
        dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        dsum(disc_price, 6).alias("sum_disc_price"),
        dsum(charge, 6).alias("sum_charge"),
        fround(dsum(F.col("l_quantity")) / F.count(F.lit(1)), 4).alias("avg_qty"),
        fround(dsum(F.col("l_extendedprice")) / F.count(F.lit(1)), 4).alias("avg_price"),
        F.count(F.lit(1)).cast("long").alias("count_order"),
    )


_Q3_ORACLE = f"""
WITH rev AS (
  SELECT o.o_orderkey, o.o_orderdate,
         {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '2000-01-01 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
  GROUP BY o.o_orderkey, o.o_orderdate
)
SELECT * FROM rev
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


@register("q3_top_revenue_orders", _Q3_ORACLE)
def q3_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> fact joins -> agg ->
    global top-k. The segment filter prunes customer before the join
    (Catalyst pushes it into the scan); revenue is decimal-exact so the
    LIMIT frontier is identical across engines."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp")
    )
    l = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    )
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias(
                "revenue"
            )
        )
    )
    return rev.orderBy(F.desc("revenue"), F.asc("o_orderkey")).limit(10)


_Q5_ORACLE = f"""
SELECT n.n_name,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 6)} AS revenue
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
"""


@register("q5_nation_revenue", _Q5_ORACLE)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with broadcast dims (region, nation,
    supplier are catalog-sized at any SF -> explicit broadcast keeps
    them map-side; only the orders<->lineitem join shuffles)."""
    r = F.broadcast(table(spark, sf_dir, "region"))
    n = F.broadcast(table(spark, sf_dir, "nation"))
    s = F.broadcast(table(spark, sf_dir, "supplier"))
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = table(spark, sf_dir, "lineitem")
    joined = (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
    )
    return joined.groupBy("n_name").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue")
    )


# ---------------------------------------------------------------------------
# Filters / projections / distinct (F1, F3, F10)
# ---------------------------------------------------------------------------

_FILTER_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment, c_acctbal
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE') AND c_acctbal > 1000
"""


@register("filter_project_customers", _FILTER_ORACLE)
def filter_project_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 (general_utils.py:74-87): IN-list + range predicate with a
    2-column-ish projection; both reach the parquet scan as
    PushedFilters/ReadSchema."""
    return (
        table(spark, sf_dir, "customer")
        .filter(
            F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
            & (F.col("c_acctbal") > 1000)
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
    )


@register("distinct_segments", "SELECT DISTINCT c_mktsegment FROM customer")
def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 (workqueue_setup.py:69): distinct over one column —
    partial-aggregated, so the shuffle carries only unique values."""
    return table(spark, sf_dir, "customer").select("c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Joins (J2/J3 semi/anti, J5 cross)
# ---------------------------------------------------------------------------

_ANTI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("customers_without_orders", _ANTI_ORACLE)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 insert-if-absent shape (workqueue_setup.py:35-44): left_anti
    join — Spark broadcasts the build side under AQE when small."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join_new(c, o, ["c_custkey"]).select("c_custkey", "c_name")


_SEMI_ORACLE = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


@register("customers_with_orders", _SEMI_ORACLE)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 membership shape (reddit.py:89): left_semi join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return semi_join_known(c, o, ["c_custkey"]).select("c_custkey", "c_name")


_CROSS_ORACLE = """
SELECT r.r_name, p.o_orderpriority
FROM region r
CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
"""


@register("task_cross_product", _CROSS_ORACLE)
def task_cross_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 task-grid generation (workqueue_setup.py:77-89): cross
    product of two small dims — the reference's lurkers x tickers
    work-queue becomes a DataFrame the scheduler partitions."""
    r = table(spark, sf_dir, "region").select("r_name")
    p = table(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return r.crossJoin(p)


# ---------------------------------------------------------------------------
# Set operations (SO1-SO3)
# ---------------------------------------------------------------------------

_SETOPS_ORACLE = """
SELECT 'intersect' AS op, n_key FROM (
  SELECT c_nationkey AS n_key FROM customer
  INTERSECT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'except' AS op, n_key FROM (
  SELECT c_nationkey AS n_key FROM customer
  EXCEPT SELECT s_nationkey FROM supplier)
UNION ALL
SELECT 'union' AS op, n_key FROM (
  SELECT c_nationkey AS n_key FROM customer
  UNION SELECT s_nationkey FROM supplier)
"""


@register("nation_set_ops", _SETOPS_ORACLE)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1-SO3 (reddit.py:89, etnet.py:145): intersect / except /
    union over key sets, tagged and unioned into one result."""
    c = table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_key"))
    s = table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_key"))
    tag = lambda df, op: df.withColumn("op", F.lit(op)).select("op", "n_key")  # noqa: E731
    return (
        tag(c.intersect(s), "intersect")
        .unionByName(tag(c.subtract(s), "except"))
        .unionByName(tag(c.union(s).distinct(), "union"))
    )


# ---------------------------------------------------------------------------
# Windows / top-k (W1, W3)
# ---------------------------------------------------------------------------

_TOPK_ORACLE = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rank FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         CAST(row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC) AS BIGINT) AS rank
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
) WHERE rank <= 3
"""


@register("topk_orders_per_segment", _TOPK_ORACLE)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 top-k-per-group (Counter.most_common analog,
    general_utils.py:143): rank window with deterministic tie-break."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    joined = c.join(o, o.o_custkey == c.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    ranked = topk_per_group(
        joined,
        ["c_mktsegment"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    )
    return ranked.select(
        "c_mktsegment", "o_orderkey", "o_totalprice", F.col("rank").cast("long").alias("rank")
    )


# ---------------------------------------------------------------------------
# Aggregations: majority vote (A1) and hierarchical rollup (A2)
# ---------------------------------------------------------------------------

_MAJORITY_ORACLE = """
WITH c AS (
  SELECT o_custkey, o_orderpriority, count(*) AS cnt
  FROM orders GROUP BY o_custkey, o_orderpriority
), r AS (
  SELECT o_custkey, o_orderpriority, cnt,
         sum(cnt) OVER (PARTITION BY o_custkey) AS total,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY cnt DESC, o_orderpriority ASC) AS rn
  FROM c
)
SELECT o_custkey,
       CASE WHEN cnt / total > 0.666 THEN o_orderpriority END AS majority_priority
FROM r WHERE rn = 1
"""


@register("majority_vote_priority", _MAJORITY_ORACLE)
def majority_vote_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 strict majority (get_sector, general_utils.py:126-147):
    modal value emitted only when its share > 0.666, else NULL; ties
    break to the smallest value (deterministic pin of the reference's
    insertion-order behavior)."""
    o = table(spark, sf_dir, "orders")
    return majority_vote(
        o, ["o_custkey"], "o_orderpriority", threshold=0.666, out_col="majority_priority"
    )


_ROLLUP_ORACLE = """
WITH coded AS (
  SELECT user_id, CAST(floor(value) AS BIGINT) AS code FROM events
), lv AS (
  SELECT user_id, code, lvl,
         CAST(floor(code / power(10, lvl)) AS BIGINT) AS rcode
  FROM coded CROSS JOIN (VALUES (0), (1), (2)) AS levels(lvl)
), counts AS (
  SELECT user_id, lvl, rcode, count(*) AS votes
  FROM lv GROUP BY user_id, lvl, rcode
), best AS (
  SELECT user_id, lvl, rcode, votes,
         sum(votes) OVER (PARTITION BY user_id, lvl) AS total,
         row_number() OVER (
           PARTITION BY user_id, lvl
           ORDER BY votes DESC, rcode ASC) AS rn
  FROM counts
), winners AS (
  SELECT user_id, lvl, rcode,
         row_number() OVER (PARTITION BY user_id ORDER BY lvl ASC) AS gr
  FROM best WHERE rn = 1 AND votes / total > 0.5
)
SELECT g.user_id,
       CAST(w.lvl AS INT) AS level,
       w.rcode AS rolled_code
FROM (SELECT DISTINCT user_id FROM coded) g
LEFT JOIN (SELECT * FROM winners WHERE gr = 1) w USING (user_id)
"""


@register("rollup_hierarchy_events", _ROLLUP_ORACLE)
def rollup_hierarchy_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 hierarchical rollup (get_sector_loose,
    general_utils.py:150-184): coarsen codes by powers of ten until a
    >50% majority appears; NULL if no level wins. Expressed as one
    explode + one shuffle + two windows (a ROLLUP with custom
    level-select)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.floor(F.col("value")).cast("long").alias("code")
    )
    return hierarchical_rollup(
        ev,
        ["user_id"],
        "code",
        levels=(0, 1, 2),
        threshold=0.5,
        out_code="rolled_code",
        out_level="level",
    ).withColumn("level", F.col("level").cast("int"))


# ---------------------------------------------------------------------------
# Time windows (T7/T8) and TTL dedup (D1)
# ---------------------------------------------------------------------------

_HOURLY_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {dsum_sql('value')} AS total_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("hourly_event_windows", _HOURLY_ORACLE)
def hourly_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 tumbling 1-hour buckets (reddit.py:100-101,
    workqueue_setup.py:81-86) as a batch groupBy; the streaming twin
    (window() + watermark) lives in ``streaming.windows``."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        dsum(F.col("value")).alias("total_value"),
    )


_TTL_ORACLE = """
SELECT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type,
         epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts ASC, event_id ASC) AS gap_ms
  FROM events
) WHERE gap_ms IS NULL OR gap_ms >= 604800000
"""


@register("ttl_dedup_events", _TTL_ORACLE)
def ttl_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 TTL'd history dedup (redislease.py:60-79: Redis SETEX, 7-day
    TTL) in renewal form: accept a sighting iff the previous sighting
    of the key is absent or >= 7 days older. One shuffle on the key;
    at 100 TB this is the batch twin of
    ``dropDuplicatesWithinWatermark``."""
    ev = table(spark, sf_dir, "events")
    return ttl_dedup(
        ev, ["user_id", "event_type"], "ts", ttl_seconds=604_800, order_tiebreak="event_id"
    ).select("event_id", "user_id", "event_type")


# ---------------------------------------------------------------------------
# Semi-structured extraction (X15 analog): JSON props
# ---------------------------------------------------------------------------

_JSON_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS total_k,
       {fround_sql("CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE) / count(*)", 4)} AS avg_k
FROM events
GROUP BY event_type
"""


@register("json_props_agg", _JSON_ORACLE)
def json_props_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X15 JSON-payload extraction (eastmoney.py:72-74 JSONP strip ->
    json.loads): ``get_json_object`` stays JVM-side; aggregation over
    the extracted value."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(k).cast("long").alias("total_k"),
        fround(F.sum(k).cast("double") / F.count(F.lit(1)), 4).alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# TPC-H q18 shape: large-volume customers (HAVING subquery + 3-way join)
# ---------------------------------------------------------------------------

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       {dsum_sql('l_quantity')} AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM big)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 100
"""


@register("q18_large_volume_customers", _Q18_ORACLE)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18 shape: orders whose total quantity exceeds a
    threshold (HAVING subquery -> left-semi join), joined back to
    customer detail, top-100 by price. Scale shape: the HAVING
    aggregate partial-aggregates map-side and produces only
    qualifying order keys; the semi-join prunes lineitem/orders
    before the wide join; the decimal quantity sum makes the
    threshold and output exact under any partial-agg order; the
    LIMIT compiles to TakeOrderedAndProject (no global sort)."""
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .filter(F.col("_q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big, "l_orderkey", "left_semi")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .orderBy(
            F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(100)
    )
