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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.functions.dates import epoch_ms
from dss_nlp_ingestion_spark.operators.bloom import bloom_build, bloom_prefilter
from dss_nlp_ingestion_spark.operators.heavyhitters import heavy_hitters_exact
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
