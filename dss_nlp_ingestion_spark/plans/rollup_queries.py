"""Grouping-set queries: CUBE over the lineitem flags — the "free
Catalyst feature" class SURVEY.md §2.6 notes the reference lacks
(no grouping-sets syntax anywhere in it); exposed so the SQL surface
is complete."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.catalog import table
from dss_nlp_ingestion_spark.plans.registry import dsum, dsum_sql, register

_CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       CAST(count(*) AS BIGINT) AS n_items,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("cube_lineitem_flags", _CUBE_ORACLE)
def cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation: all 2^2 grouping sets in one pass (partial
    aggregation expands grouping sets map-side; one shuffle)."""
    li = table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        dsum(F.col("l_quantity")).alias("sum_qty"),
    )
