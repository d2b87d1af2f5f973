"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``dss_nlp_ingestion_spark`` package; this
module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dss_nlp_ingestion_spark.plans import ORACLES, QUERIES  # noqa: E402
from dss_nlp_ingestion_spark.session import ship_package  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _shipped(fn: Callable[[SparkSession, str], DataFrame]):
    """Wrap a query so the package zip reaches executor Python workers
    (addPyFile) no matter what SparkSession/cwd the caller uses —
    without it, any mapInPandas stage fails with ModuleNotFoundError
    when the driver's cwd is not the repo root."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    ship_package(spark)
    return QUERIES["flagship_doc_profile"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _shipped(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL oracle per query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return dict(ORACLES)
