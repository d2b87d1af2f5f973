"""Data-mining surface: exact heavy hitters (two-pass Misra-Gries),
Bloom-prefiltered semi joins, group-wise OLS trend fitting, and
funnel conversion — the hot-key / runtime-filter / trend-analysis
capabilities a 100 TB event pipeline leans on daily.

Determinism notes (registry.py rules): heavy-hitter and funnel cuts
are integer arithmetic (``cnt * k > n``, strict timestamp ordering);
regression inputs are exact decimal sums so only the final closed-form
division is float (identical IEEE expression both engines, then
floor-rounded); the Bloom filter is one-sided, the exact join after it
defines the result, so the oracle never needs to model the bitmap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.dates import epoch_ms
from dss_nlp_ingestion_spark.operators.bloom import bloom_build, bloom_prefilter
from dss_nlp_ingestion_spark.operators.heavyhitters import heavy_hitters_exact
from dss_nlp_ingestion_spark.operators.relational import (
    consecutive_day_streaks,
    cusum_scaled_deviation,
    exact_rank_values,
    lateness_audit,
)
from dss_nlp_ingestion_spark.functions.text import readability_features
from dss_nlp_ingestion_spark.plans.registry import (
    dsum_sql,
    fround,
    fround_sql,
    register,
)

# ---------------------------------------------------------------------------
# Exact heavy hitters over the event stream
# ---------------------------------------------------------------------------

_HH_K = 120

_HH_ORACLE = f"""
WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n FROM events),
c AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
)
SELECT c.user_id, c.cnt, t.n,
       {fround_sql('CAST(c.cnt AS DOUBLE) / t.n', 6)} AS share
FROM c, t
WHERE c.cnt * {_HH_K} > t.n
"""


@register("heavy_hitters_users", _HH_ORACLE)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users above 1/{k} of all event traffic, with EXACT counts —
    two-pass Misra-Gries (candidates scan-side, zero shuffle; exact
    verify shuffles candidate rows only). The oracle is the full
    groupBy+HAVING; the two-pass form must match it bit-for-bit
    because MG guarantees a candidate superset and the verify pass is
    exact (operators/heavyhitters.py)."""
    ev = table(spark, sf_dir, "events")
    hh = heavy_hitters_exact(ev, "user_id", _HH_K)
    return hh.select(
        "user_id",
        "cnt",
        "n",
        fround(F.col("cnt").cast("double") / F.col("n"), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Bloom-prefiltered semi join (runtime filter as an operator)
# ---------------------------------------------------------------------------

_BLOOM_ORACLE = f"""
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       {dsum_sql('o.o_totalprice')} AS total_price
FROM orders o
WHERE o.o_custkey IN (
  SELECT c_custkey FROM customer
  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 5000
)
GROUP BY o.o_orderpriority
"""


@register("bloom_semijoin_orders", _BLOOM_ORACLE)
def bloom_semijoin_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority for orders of rich BUILDING-segment
    customers — fact rows pass a Bloom bitmap of the dimension keys
    (1-row broadcast, codegen bit probes) BEFORE the exact semi join,
    so at scale the join exchange carries only ~selective-fraction of
    the fact table (operators/bloom.py). Bloom false positives are
    removed by the exact join, hence the plain IN-subquery oracle."""
    cust = table(spark, sf_dir, "customer")
    orders = table(spark, sf_dir, "orders")
    build_keys = cust.filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 5000)
    ).select("c_custkey")
    bloom = bloom_build(build_keys, "c_custkey")
    pruned = bloom_prefilter(orders, "o_custkey", bloom)
    joined = pruned.join(
        F.broadcast(build_keys.withColumnRenamed("c_custkey", "o_custkey")),
        "o_custkey",
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Group-wise OLS trend (closed form over exact sums)
# ---------------------------------------------------------------------------

def _sq_sum_sql(expr: str) -> str:
    """Exact sum of squares: wide decimal so sf-1 magnitudes fit."""
    return f"CAST(sum(CAST(({expr}) AS DECIMAL(30,2))) AS DOUBLE)"


_REGR_ORACLE = f"""
WITH s AS (
  SELECT l_returnflag, l_linestatus,
         CAST(count(*) AS BIGINT) AS n,
         {dsum_sql('l_quantity')} AS sx,
         {dsum_sql('l_extendedprice')} AS sy,
         {_sq_sum_sql('l_quantity * l_extendedprice')} AS sxy,
         {_sq_sum_sql('l_quantity * l_quantity')} AS sxx,
         {_sq_sum_sql('l_extendedprice * l_extendedprice')} AS syy
  FROM lineitem
  GROUP BY l_returnflag, l_linestatus
)
SELECT l_returnflag, l_linestatus, n,
  {fround_sql('(CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)', 6)} AS slope,
  {fround_sql('(sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) / CAST(n AS DOUBLE)', 4)} AS intercept,
  {fround_sql('((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy)) / ((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))', 6)} AS r2
FROM s
"""


@register("regr_trend_by_flag", _REGR_ORACLE)
def regr_trend_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (returnflag, linestatus): OLS slope/intercept/R^2 of
    extendedprice on quantity, from the five classic sufficient
    statistics in ONE partial-aggregated pass (no second scan, no
    per-group fit). Sums are exact decimals (order-independent);
    the closed-form divisions are the only float ops and share one
    IEEE expression tree with the oracle."""
    li = table(spark, sf_dir, "lineitem")
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(q.cast("decimal(18,2)")).cast("double").alias("sx"),
        F.sum(p.cast("decimal(18,2)")).cast("double").alias("sy"),
        F.sum((q * p).cast("decimal(30,2)")).cast("double").alias("sxy"),
        F.sum((q * q).cast("decimal(30,2)")).cast("double").alias("sxx"),
        F.sum((p * p).cast("decimal(30,2)")).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return s.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        fround(slope, 6).alias("slope"),
        fround((F.col("sy") - slope * F.col("sx")) / nd, 4).alias("intercept"),
        fround((cov_n * cov_n) / (var_x * var_y), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Funnel conversion (ordered multi-stage)
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH m AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
    min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  CAST(count(*) AS BIGINT) AS n_users,
  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
  CAST(sum(CASE WHEN t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
  CAST(sum(CASE WHEN t_click > t_view AND t_view > t_signup THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
  CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view AND t_view > t_signup
           THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
  CAST(sum(CASE WHEN t_purchase > t_click AND t_click > t_view AND t_view > t_signup
           THEN epoch_ms(t_purchase) - epoch_ms(t_signup) END) AS BIGINT) AS conv_ms_total
FROM m
"""


@register("funnel_conversion_counts", _FUNNEL_ORACLE)
def funnel_conversion_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered signup -> view -> click -> purchase funnel:
    first-touch times per stage via conditional MIN in one groupBy,
    stage survival by strict timestamp ordering (NULL-safe: a missing
    stage makes the comparison NULL -> not counted). One shuffle on
    user_id, one 1-row final aggregate; the total conversion lag is
    an exact BIGINT ms sum."""
    ev = table(spark, sf_dir, "events")

    def first_t(t: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    m = ev.groupBy("user_id").agg(
        first_t("signup").alias("t_signup"),
        first_t("view").alias("t_view"),
        first_t("click").alias("t_click"),
        first_t("purchase").alias("t_purchase"),
    )
    sv = F.col("t_view") > F.col("t_signup")
    sc = (F.col("t_click") > F.col("t_view")) & sv
    sp = (F.col("t_purchase") > F.col("t_click")) & sc
    one = F.lit(1)
    zero = F.lit(0)
    return m.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum(F.when(F.col("t_signup").isNotNull(), one).otherwise(zero))
        .cast("long")
        .alias("n_signup"),
        F.sum(F.when(sv, one).otherwise(zero)).cast("long").alias("n_view"),
        F.sum(F.when(sc, one).otherwise(zero)).cast("long").alias("n_click"),
        F.sum(F.when(sp, one).otherwise(zero)).cast("long").alias("n_purchase"),
        F.sum(F.when(sp, epoch_ms("t_purchase") - epoch_ms("t_signup")))
        .cast("long")
        .alias("conv_ms_total"),
    )


# ---------------------------------------------------------------------------
# Gaps-and-islands: consecutive-day activity streaks
# ---------------------------------------------------------------------------

_STREAKS_ORACLE = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         date_diff('day', DATE '2024-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM d
), s AS (
  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
  FROM r GROUP BY user_id, grp
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_streaks,
       max(len) AS max_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM s GROUP BY user_id
"""


@register("activity_streaks", _STREAKS_ORACLE)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands rewrite: distinct active days, then
    ``day_number - row_number`` is constant within an island, so
    streaks fall out of a groupBy with NO self-join or window-frame
    scan. Two key-bounded shuffles (distinct, window+agg share the
    user_id partitioning)."""
    ev = table(spark, sf_dir, "events")
    return consecutive_day_streaks(ev, "user_id", "ts")


# ---------------------------------------------------------------------------
# Deterministic A/B split + conversion lift + chi-square
# ---------------------------------------------------------------------------

_AB_HASH = "(('0x' || substr(sha256('ab:' || CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 2)"

_AB_ORACLE = f"""
WITH u AS (
  SELECT user_id,
         {_AB_HASH} AS variant,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purch
  FROM events GROUP BY user_id
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n_purch) AS BIGINT) AS total_purch
  FROM u
), t AS (
  SELECT
    CAST(sum(CASE WHEN variant = 0 AND n_purch * g.n_users > g.total_purch THEN 1 ELSE 0 END) AS BIGINT) AS a_conv,
    CAST(sum(CASE WHEN variant = 0 AND n_purch * g.n_users <= g.total_purch THEN 1 ELSE 0 END) AS BIGINT) AS a_rest,
    CAST(sum(CASE WHEN variant = 1 AND n_purch * g.n_users > g.total_purch THEN 1 ELSE 0 END) AS BIGINT) AS b_conv,
    CAST(sum(CASE WHEN variant = 1 AND n_purch * g.n_users <= g.total_purch THEN 1 ELSE 0 END) AS BIGINT) AS b_rest
  FROM u, g
)
SELECT a_conv, a_rest, b_conv, b_rest,
  {fround_sql('CAST(a_conv AS DOUBLE) / (a_conv + a_rest)', 6)} AS rate_a,
  {fround_sql('CAST(b_conv AS DOUBLE) / (b_conv + b_rest)', 6)} AS rate_b,
  {fround_sql('(CAST(b_conv AS DOUBLE) / (b_conv + b_rest)) / nullif(CAST(a_conv AS DOUBLE) / (a_conv + a_rest), 0.0) - 1.0', 6)} AS lift,
  {fround_sql('(CAST(a_conv + a_rest + b_conv + b_rest AS DOUBLE) * (CAST(a_conv AS DOUBLE) * b_rest - CAST(a_rest AS DOUBLE) * b_conv) * (CAST(a_conv AS DOUBLE) * b_rest - CAST(a_rest AS DOUBLE) * b_conv)) / nullif(CAST(a_conv + a_rest AS DOUBLE) * (b_conv + b_rest) * (a_conv + b_conv) * (a_rest + b_rest), 0.0)', 6)} AS chi2
FROM t
"""


@register("ab_test_lift", _AB_ORACLE)
def ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic A/B analysis: users split 50/50 by a salted sha
    bucket (pure key function — stable across reruns/engines, the
    same discipline as hash_sample_docs), conversion = above-average
    purchaser (integer cross-multiplied cut, scale-free), then lift
    and the 2x2 chi-square statistic. Counts are integers until the
    single closed-form float expression, shared verbatim with the
    oracle; degenerate arms yield NULL on both engines via nullif."""
    ev = table(spark, sf_dir, "events")
    h = F.sha2(F.concat(F.lit("ab:"), F.col("user_id").cast("string")), 256)
    variant = F.conv(F.substring(h, 1, 13), 16, 10).cast("long") % 2
    u = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("n_purch")
    ).select(variant.alias("variant"), "n_purch")
    g = u.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n_purch").cast("long").alias("total_purch"),
    )
    conv = F.col("n_purch") * F.col("n_users") > F.col("total_purch")
    one, zero = F.lit(1), F.lit(0)
    t = (
        u.crossJoin(F.broadcast(g))
        .agg(
            F.sum(F.when((F.col("variant") == 0) & conv, one).otherwise(zero))
            .cast("long")
            .alias("a_conv"),
            F.sum(F.when((F.col("variant") == 0) & ~conv, one).otherwise(zero))
            .cast("long")
            .alias("a_rest"),
            F.sum(F.when((F.col("variant") == 1) & conv, one).otherwise(zero))
            .cast("long")
            .alias("b_conv"),
            F.sum(F.when((F.col("variant") == 1) & ~conv, one).otherwise(zero))
            .cast("long")
            .alias("b_rest"),
        )
    )
    a_c, a_r = F.col("a_conv"), F.col("a_rest")
    b_c, b_r = F.col("b_conv"), F.col("b_rest")
    rate_a = a_c.cast("double") / (a_c + a_r)
    rate_b = b_c.cast("double") / (b_c + b_r)
    det = a_c.cast("double") * b_r - a_r.cast("double") * b_c
    n_d = (a_c + a_r + b_c + b_r).cast("double")
    denom = F.nullif(
        (a_c + a_r).cast("double") * (b_c + b_r) * (a_c + b_c) * (a_r + b_r),
        F.lit(0.0),
    )
    return t.select(
        "a_conv",
        "a_rest",
        "b_conv",
        "b_rest",
        fround(rate_a, 6).alias("rate_a"),
        fround(rate_b, 6).alias("rate_b"),
        fround(rate_b / F.nullif(rate_a, F.lit(0.0)) - F.lit(1.0), 6).alias("lift"),
        fround((n_d * det * det) / denom, 6).alias("chi2"),
    )


# ---------------------------------------------------------------------------
# GDPR cascade erasure across ACID tables
# ---------------------------------------------------------------------------

_GDPR_PRED_SQL = (
    "(('0x' || substr(sha256('gdpr:' || CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 5) = 0"
)
_GDPR_PRED_SPARK = (
    "CAST(conv(substring(sha2(concat('gdpr:', CAST(user_id AS STRING)), 256), 1, 13),"
    " 16, 10) AS BIGINT) % 5 = 0"
)

_GDPR_ORACLE = f"""
WITH kept AS (
  SELECT * FROM events WHERE NOT ({_GDPR_PRED_SQL})
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(count(*) AS BIGINT) AS activity_rows
FROM kept GROUP BY user_id
"""


@register("gdpr_cascade_delete", _GDPR_ORACLE)
def gdpr_cascade_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure across the lakehouse: the SAME key-pure
    erasure predicate is applied as a ``DELETE FROM`` commit to every
    ACID table carrying the subject key (an activity fact table AND a
    per-user profile table), each a file-pruned COW commit with its
    own audit trail in the tx log. The result joins the two tables
    post-erasure; the hash gate proves both deletes landed and agree
    (profile aggregates == re-aggregated remaining activity). At
    scale each delete rewrites only files whose logged user_id range
    intersects the predicate."""
    import tempfile

    from dss_nlp_ingestion_spark.sources import txlog

    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.floor(F.col("value") * 100).cast("long").alias("cents")
    )
    base = tempfile.mkdtemp(prefix="dss_gdpr_")
    act_path, prof_path = base + "/activity", base + "/profiles"
    txlog.create_table(
        ev.repartitionByRange(4, "user_id"), act_path, stats_cols=["user_id"]
    )
    profiles = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
    txlog.create_table(
        profiles.repartitionByRange(4, "user_id"), prof_path, stats_cols=["user_id"]
    )
    for path in (act_path, prof_path):
        txlog.delete_from_table(spark, path, _GDPR_PRED_SPARK, stats_cols=["user_id"])
    act_counts = (
        txlog.read(spark, act_path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("activity_rows"))
    )
    return (
        txlog.read(spark, prof_path)
        .join(act_counts, "user_id")
        .select("user_id", "n_events", "total_cents", "activity_rows")
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto frontier): earliest-and-most-valuable orders
# ---------------------------------------------------------------------------

_SKYLINE_ORACLE = """
SELECT a.o_orderkey, a.o_orderdate, a.o_totalprice
FROM orders a
WHERE a.o_orderpriority = '1-URGENT'
  AND NOT EXISTS (
    SELECT 1 FROM orders b
    WHERE b.o_orderpriority = '1-URGENT'
      AND b.o_orderdate <= a.o_orderdate
      AND b.o_totalprice >= a.o_totalprice
      AND (b.o_orderdate < a.o_orderdate OR b.o_totalprice > a.o_totalprice)
  )
"""


@register("skyline_orders", _SKYLINE_ORACLE)
def skyline_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier: minimize order date, maximize
    total price) of urgent orders via the sort-based rewrite — NO
    quadratic dominance join. A row survives iff no strictly-earlier
    row has >= its price and no same-day row has > its price: two
    window maxima decide membership.

    Scale shape: a MONTH-partitioned local prune runs first (same two
    windows within each month — removes almost everything, fully
    parallel, and is LOSSLESS because dominance is transitive: any
    global dominator of a locally-pruned row either survives its own
    month or is itself dominated by a survivor). Only local survivors
    — frontier-sized, not data-sized — reach the global
    single-ordering pass. The oracle states dominance as the
    independent NOT EXISTS definition, so the rewrite is verified
    against the spec, not against itself."""
    orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
    )

    def skyline_pass(df: DataFrame, *partition_cols: str) -> DataFrame:
        day = F.unix_date(F.to_date("o_orderdate"))
        w_earlier = (
            Window.partitionBy(*partition_cols)
            .orderBy(day)
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        w_same = Window.partitionBy(*partition_cols, F.to_date("o_orderdate"))
        return (
            df.withColumn("_earlier_max", F.max("o_totalprice").over(w_earlier))
            .withColumn("_same_max", F.max("o_totalprice").over(w_same))
            .filter(
                ~(
                    F.coalesce(
                        F.col("_earlier_max") >= F.col("o_totalprice"), F.lit(False)
                    )
                    | (F.col("_same_max") > F.col("o_totalprice"))
                )
            )
            .drop("_earlier_max", "_same_max")
        )

    local = skyline_pass(
        orders.withColumn("_month", F.date_trunc("month", "o_orderdate")), "_month"
    ).drop("_month")
    return skyline_pass(local)


# ---------------------------------------------------------------------------
# Frequent itemsets: co-purchased part pairs with support
# ---------------------------------------------------------------------------

_COPURCHASE_ORACLE = """
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
)
SELECT part_a, part_b, support FROM pairs WHERE support >= 2
"""


def basket_item_pairs(li: "DataFrame", min_support: int = 2) -> "DataFrame":
    """The canonical basket-local co-purchase pair table
    (part_a < part_b, support >= min_support): sorted distinct item
    arrays via collect_set (ONE order-key shuffle — no separate
    distinct pass) -> double explode
    bounded by basket size squared -> one partial-aggregated count.
    Shared by every pair statistic (support / lift / chi2 /
    confidence / k-core / degree audit) so thresholds and the
    distinct step can never silently diverge between them (r5
    code-review finding: five inline copies)."""
    baskets = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("_its"))
    )
    return (
        baskets.select(F.explode("_its").alias("part_a"), "_its")
        .select("part_a", F.explode("_its").alias("part_b"))
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )


@register("copurchase_pairs_support", _COPURCHASE_ORACLE)
def copurchase_pairs_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-itemset mining, the A-Priori L2 step: part pairs
    co-occurring in >= 2 orders. Baskets become sorted distinct item
    arrays (one shuffle on order key), pairs are generated
    BASKET-LOCALLY by a double explode — per-row work bounded by
    basket size squared (TPC-H baskets <= 7 items), never a
    posting-list self-join over the fact table — then one
    partial-aggregated count on the pair key."""
    return basket_item_pairs(table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# CUSUM drift detection over the hourly event rate (integer-scaled)
# ---------------------------------------------------------------------------

_CUSUM_ORACLE = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY date_trunc('hour', ts)
), g AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hours, CAST(sum(c) AS BIGINT) AS total FROM h
), s AS (
  SELECT h.hour, h.c,
         sum(h.c * g.n_hours - g.total)
           OVER (ORDER BY h.hour ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s_scaled,
         g.n_hours, g.total
  FROM h, g
)
SELECT hour, c, CAST(s_scaled AS BIGINT) AS s_scaled
FROM s
WHERE abs(s_scaled) * 10 > n_hours * total
"""


@register("cusum_changepoints", _CUSUM_ORACLE)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-drift detection: hours where the integer-scaled CUSUM of
    hourly event counts exceeds 10% of H*T
    (operators/relational.py:cusum_scaled_deviation — exact integers
    end-to-end, no float mean)."""
    ev = table(spark, sf_dir, "events")
    s = cusum_scaled_deviation(ev, "ts")
    return s.filter(
        F.abs(F.col("s_scaled")) * 10 > F.col("n_hours") * F.col("total")
    ).select("hour", "c", "s_scaled")


# ---------------------------------------------------------------------------
# Readability scoring (deterministic Flesch reading ease)
# ---------------------------------------------------------------------------

_READABILITY_ORACLE = """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences
  FROM documents WHERE length(trim(text)) > 0
)
SELECT doc_id, n_words, n_syllables, n_sentences,
  {flesch} AS flesch
FROM t
""".format(
    flesch=fround_sql(
        "206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)"
        " - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)",
        4,
    )
)


@register("readability_scores", _READABILITY_ORACLE)
def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease per document with a deterministic
    vowel-group syllable heuristic — the curation-pipeline
    readability gate (functions/text.py:readability_features; pure
    scan-side expressions, zero shuffles; one shared IEEE float tree,
    floor-rounded)."""
    docs = table(spark, sf_dir, "documents")
    t = readability_features(docs, "doc_id", "text")
    return t.select(
        "doc_id",
        "n_words",
        "n_syllables",
        "n_sentences",
        fround(F.col("flesch_raw"), 4).alias("flesch"),
    )


# ---------------------------------------------------------------------------
# Event-time lateness audit (watermark sizing)
# ---------------------------------------------------------------------------

_LATENESS_ORACLE = """
WITH o AS (
  SELECT user_id, epoch_ms(ts) AS t,
         max(epoch_ms(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS hwm
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN t < hwm THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       CAST(max(hwm - t) AS BIGINT) AS max_lateness_ms,
       CAST(sum(hwm - t) AS BIGINT) AS total_lateness_ms
FROM o GROUP BY user_id
"""


@register("lateness_audit_by_user", _LATENESS_ORACLE)
def lateness_audit_by_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time lateness audit — the observability query behind
    choosing a streaming watermark delay: replaying each user's
    events in ARRIVAL order (event_id, the ingest sequence), how many
    arrive behind the user's event-time high-water mark, and by how
    much? A per-user running-max window (key-partitioned — scales
    with users, no global ordering) then one aggregate sharing the
    same user_id exchange; exact BIGINT milliseconds end-to-end."""
    ev = table(spark, sf_dir, "events")
    return lateness_audit(ev, "user_id", "event_id", "ts")


# Same oracle as the batch cusum_changepoints: an availableNow drain
# of the streaming hourly aggregate over a static source equals the
# batch hourly counts, and the CUSUM fold downstream is deterministic
# — full hash gate, not rows-only.
_STREAM_CUSUM_ORACLE = _CUSUM_ORACLE


@register("streaming_cusum_changepoints", _STREAM_CUSUM_ORACLE)
def streaming_cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drift detector wired to STREAMING ingest: file source ->
    watermarked hourly window aggregate -> availableNow drain into a
    memory sink -> the same integer CUSUM fold
    (operators/relational.py:cusum_from_hourly) over the drained
    series. Proves the monitoring query composes with Structured
    Streaming end-to-end; hash-gated against the batch oracle."""
    import tempfile

    from dss_nlp_ingestion_spark.operators.relational import cusum_from_hourly
    from dss_nlp_ingestion_spark.streaming.pipeline import (
        read_events_stream,
        run_complete_available_now,
    )

    events = table(spark, sf_dir, "events")
    src = tempfile.mkdtemp(prefix="dss_stream_cusum_")
    events.write.mode("overwrite").parquet(src)
    stream = read_events_stream(spark, src, schema=events.schema)
    hourly = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    run_complete_available_now(hourly, "dss_streaming_cusum_hours")
    s = cusum_from_hourly(spark.table("dss_streaming_cusum_hours"))
    return s.filter(
        F.abs(F.col("s_scaled")) * 10 > F.col("n_hours") * F.col("total")
    ).select("hour", "c", "s_scaled")


# ---------------------------------------------------------------------------
# Sort-free exact octile boundaries (range-partition planning)
# ---------------------------------------------------------------------------

_OCTILES_ORACLE = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM orders),
r AS (
  SELECT CAST(i AS INT) AS rank_idx,
         CAST((i * n.n + 7) // 8 AS BIGINT) AS rank_pos
  FROM range(1, 9) t(i), n
),
s AS (
  SELECT o_totalprice AS v,
         row_number() OVER (ORDER BY o_totalprice) AS rn
  FROM orders
)
SELECT r.rank_idx, r.rank_pos, s.v AS value
FROM r JOIN s ON s.rn = r.rank_pos
"""


@register("exact_octile_boundaries", _OCTILES_ORACLE)
def exact_octile_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The range-partition planner's input: EXACT octile boundaries
    of o_totalprice (positions ceil(i*n/8), i=1..8) via sort-free
    selection (operators/relational.py:exact_rank_values — histogram
    + targeted bucket refinement; no global sort at any point). The
    oracle is the straightforward row_number selection, so the
    bucketed path is verified against the sorted definition."""
    orders = table(spark, sf_dir, "orders")
    n = orders.agg(F.count(F.lit(1)).cast("long").alias("_n"))
    ranks = (
        spark.range(1, 9)
        .select(F.col("id").cast("int").alias("rank_idx"))
        .crossJoin(F.broadcast(n))
        .select(
            "rank_idx",
            F.floor((F.col("rank_idx") * F.col("_n") + 7) / 8)
            .cast("long")
            .alias("rank_pos"),
        )
    )
    return exact_rank_values(orders, "o_totalprice", ranks)


# ---------------------------------------------------------------------------
# Association strength (log-free PMI ordering) for frequent pairs
# ---------------------------------------------------------------------------

_LIFT_EXPR = "CAST(p.support AS DOUBLE) * n.n_orders / (sa.s * sb.s)"

_LIFT_ORACLE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), n AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM items
), supp AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS s FROM items GROUP BY l_partkey
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS support
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
  HAVING count(*) >= 2
)
SELECT p.part_a, p.part_b, p.support,
       {fround_sql(_LIFT_EXPR, 6)} AS lift
FROM pairs p
JOIN supp sa ON sa.l_partkey = p.part_a
JOIN supp sb ON sb.l_partkey = p.part_b
CROSS JOIN n
ORDER BY {_LIFT_EXPR} DESC, p.part_a, p.part_b
LIMIT 50
"""


@register("copurchase_lift_topk", _LIFT_ORACLE)
def copurchase_lift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association strength for the frequent co-purchase pairs:
    lift = support * N / (supp_a * supp_b) — the log-free PMI
    ordering (monotone in PMI, so no cross-engine libm hazard).
    Per-item supports broadcast onto the pair table; top-50 by
    (lift, pair id) — (part_a, part_b) is unique, so the order is
    total. Basket-local pair generation as in
    copurchase_pairs_support."""
    li = table(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    n = items.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n_orders")
    )
    supp = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("long").alias("s")
    )
    pairs = basket_item_pairs(li)
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("_sa"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("_sb"))
    scored = (
        pairs.join(F.broadcast(sa), "part_a")
        .join(F.broadcast(sb), "part_b")
        .crossJoin(F.broadcast(n))
    )
    lift_raw = (
        F.col("support").cast("double")
        * F.col("n_orders")
        / (F.col("_sa") * F.col("_sb"))
    )
    return (
        scored.orderBy(lift_raw.desc(), "part_a", "part_b")
        .limit(50)
        .select(
            "part_a", "part_b", "support", fround(lift_raw, 6).alias("lift")
        )
    )


# ---------------------------------------------------------------------------
# Sliding-window distinct users (exact, explode-by-coverage)
# ---------------------------------------------------------------------------

_SLIDING_DISTINCT_ORACLE = """
WITH e AS (
  SELECT epoch_ms(ts) // 3600000 AS hb, user_id FROM events
), cov AS (
  SELECT (hb - k) * 3600000 AS window_start_ms, user_id
  FROM e, (SELECT unnest(range(0, 3)) AS k)
), d AS (
  SELECT DISTINCT window_start_ms, user_id FROM cov
)
SELECT CAST(window_start_ms AS BIGINT) AS window_start_ms,
       CAST(count(*) AS BIGINT) AS n_distinct_users
FROM d GROUP BY window_start_ms
"""


@register("sliding_distinct_users", _SLIDING_DISTINCT_ORACLE)
def sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct-user counts over 3-hour windows sliding by 1
    hour — the overlap-window metric HLL sketches approximate,
    computed exactly by the coverage-explode rewrite: each event
    lands in the 3 windows covering it (bounded 3x row blowup —
    window_size/step, a constant), then one (window, user) distinct
    and one count. Two key-bounded shuffles; integer epoch-hour
    arithmetic shared verbatim with the oracle."""
    ev = table(spark, sf_dir, "events")
    e = ev.select(
        F.floor(epoch_ms("ts") / 3600000).cast("long").alias("hb"), "user_id"
    )
    cov = e.select(
        F.explode(F.sequence(F.lit(0), F.lit(2))).alias("k"), "hb", "user_id"
    ).select(
        ((F.col("hb") - F.col("k")) * 3600000).alias("window_start_ms"),
        "user_id",
    )
    return (
        cov.distinct()
        .groupBy("window_start_ms")
        .agg(F.count(F.lit(1)).cast("long").alias("n_distinct_users"))
        .select(
            F.col("window_start_ms").cast("long").alias("window_start_ms"),
            "n_distinct_users",
        )
    )
