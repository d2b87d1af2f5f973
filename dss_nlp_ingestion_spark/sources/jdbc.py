"""JDBC dimension scans (SURVEY.md §2.1 S6).

The reference pulls the stock universe from Postgres with an explicit
column list + WHERE + fetchmany (src/workqueue_setup.py:25-29,
src/utils/database_api.py:84-128). Spark's JDBC source pushes the
predicate and projection down and ``limit`` maps to fetchmany; for a
dimension this small one partition is right, for big tables pass
``partition_column``/bounds to parallelize the scan.

No database ships in this container, so this module only *builds*
readers; tests cover the option plumbing, not a live connection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def universe_reader(
    spark: SparkSession,
    url: str,
    table: str = "public.universe",
    predicate: str = "is_active AND icb_code != 'NA'",
    columns: tuple[str, ...] = (
        "ticker",
        "ticker_symbol",
        "ticker_name",
        "icb_code",
        "currency_code",
    ),
    num_to_fetch: int | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    **options: str,
):
    """Build the S6 universe scan: dbtable is a pushdown subquery
    (projection + predicate run in the database, not in Spark)."""
    cols = ", ".join(columns)
    subq = f"(SELECT {cols} FROM {table} WHERE {predicate}) AS universe"
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", subq)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions or 8))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def load_universe(reader, num_to_fetch: int | None = None) -> DataFrame:
    """Materialize the scan; ``num_to_fetch`` -> LIMIT pushdown
    (fetchmany analog, database_api.py:119-122)."""
    df = reader.load()
    return df.limit(num_to_fetch) if num_to_fetch else df
