"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-reproducibility (UTC session
timezone, ANSI off so behavior matches classic SQL semantics) and for
scale (AQE with skew-join handling and partition coalescing, Arrow for
any pandas-UDF stage). On a real cluster the same settings apply; only
``master`` changes.
"""

from __future__ import annotations

import os
import tempfile
import zipfile
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_CONF: dict[str, str] = {
    # --- determinism / semantics ---
    "spark.sql.session.timeZone": "UTC",
    # --- memory: local-mode driver hosts all executor threads in one
    # JVM; the 1g default heap forces spills/GC on any persist or
    # wide shuffle. -Xmx is a cap, not a reservation — safe for
    # test sessions too. Only applies at JVM launch (getOrCreate on a
    # live session ignores it, same as any cluster). ---
    "spark.driver.memory": "48g",
    "spark.driver.maxResultSize": "4g",
    # --- adaptive execution: runtime re-plan, skew splitting, coalesce ---
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # --- broadcast threshold: dims (region/nation/universe) stay map-side ---
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- Arrow for pandas UDF / toPandas boundaries ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- scan granularity: 128 MiB splits a 100 TB table into ~800k tasks ---
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # --- parquet ---
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # timestamp[us] with isAdjustedToUTC=false must read as TIMESTAMP,
    # not TIMESTAMP_NTZ — epoch math (unix_millis, session_window) and
    # the UTC-pinned session make the two numerically identical while
    # keeping every chrono builtin applicable. Also set per-read in
    # catalog.table() for sessions not built by this factory.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


# Sessions (by applicationId) that already have the package zip on
# their Python-worker path — addPyFile is done once per session.
_SHIPPED: set[str] = set()


def ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Python workers resolve ``import dss_nlp_ingestion_spark`` through
    their own ``sys.path``, which does NOT inherit the driver's
    ``sys.path`` inserts — only its cwd. Any ``mapInPandas``/pandas-UDF
    stage therefore breaks with ModuleNotFoundError when the driver
    runs from a different working directory. Zipping the package and
    registering it with ``addPyFile`` makes the session location-
    independent — exactly what ``spark-submit --py-files`` does on a
    real cluster."""
    app_id = spark.sparkContext.applicationId
    if app_id in _SHIPPED:
        return
    pkg_dir = Path(__file__).resolve().parent
    zip_path = Path(tempfile.gettempdir()) / f"dss_nlp_ingestion_spark-{os.getpid()}.zip"
    if not zip_path.exists():
        tmp = zip_path.with_suffix(".tmp")
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
            for py in sorted(pkg_dir.rglob("*.py")):
                zf.write(py, arcname=f"{pkg_dir.name}/{py.relative_to(pkg_dir)}")
        tmp.rename(zip_path)
    spark.sparkContext.addPyFile(str(zip_path))
    _SHIPPED.add(app_id)


def get_spark(
    app_name: str = "dss-nlp-ingestion-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset, so
    tests and bench share one code path; on a cluster pass ``None`` and
    let spark-submit decide.
    """
    # Wire a protobuf runtime (driver + worker PYTHONPATH) BEFORE the
    # JVM launches — Spark-4 typed-state streaming needs it in every
    # Python worker; best-effort no-op when none exists on disk.
    from dss_nlp_ingestion_spark.pbcompat import ensure_protobuf

    ensure_protobuf()
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark


def release_cached(spark: SparkSession) -> None:
    """Drop every cached DataFrame and persisted/localCheckpointed RDD
    in the session. Sequential multi-query harnesses (bench, the
    driver's correctness sweep) need this between queries: iterative
    operators persist working sets for the lifetime of their lazy
    result, and localCheckpoint blocks survive until the JVM garbage-
    collects the RDD reference — across a 160-query sweep the leaked
    blocks accumulate into executor-memory pressure that shows up as
    multi-x GC slowdowns on late queries. Only call BETWEEN queries:
    unpersisting a localCheckpointed RDD that a still-live plan needs
    would make that plan unrecomputable."""
    spark.catalog.clearCache()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for jrdd in list(jmap.values()):
        try:
            jrdd.unpersist(False)
        except Exception:  # noqa: BLE001 — already-released is fine
            pass
