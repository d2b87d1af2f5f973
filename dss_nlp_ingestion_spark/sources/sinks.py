"""Sink semantics (SURVEY.md §2.2 K1–K4) over a partitioned parquet
document store.

- K1 bulk append    — ``insert_many(ordered=False)`` (src/base.py:272)
  -> partition-parallel parquet append.
- K2 idempotent load — ES ``_op_type='create'`` + ``just_insert``
  flip (src/utils/database_utils.py:83-113, src/base.py:155-196) ->
  anti-join-then-append MERGE (insert-if-absent keyed on
  ``unique_identifier``).
- K4 replicate-if-absent — per-row exists check
  (src/workqueue_setup.py:14-46) -> the same anti-join append.

The store layout is ``<root>/source=<s>/...`` (partitioned by
source), so per-collection reads prune partitions — the Spark
equivalent of the reference's per-source Mongo collections.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bulk_append(df: DataFrame, store_path: str, partition_by: tuple[str, ...] = ("source",)) -> None:
    """K1: unordered batch append, partitioned for pruning."""
    df.write.mode("append").partitionBy(*partition_by).parquet(store_path)


def read_store(
    spark: SparkSession, store_path: str, merge_schema: bool = False
) -> DataFrame:
    """Scan the store. ``merge_schema=True`` unions the schemas of all
    parquet footers (Spark's mergeSchema), so a store whose batches
    gained columns over time reads as the superset with NULLs for
    files written before a column existed — the additive half of
    schema evolution, which is the only half append-only ingestion
    needs (drops/renames are a rewrite, see compact_store). Off by
    default: footer-merging lists every file's schema, which costs at
    100 TB — production pins an explicit contract schema instead."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(store_path)


def idempotent_append(
    spark: SparkSession,
    df: DataFrame,
    store_path: str,
    key: str = "unique_identifier",
    partition_by: tuple[str, ...] = ("source",),
) -> int:
    """K2/D4: insert-if-absent — anti-join the incoming batch against
    the store's key set, append only novel rows. Returns the number of
    rows appended. (On a transactional table format this is a single
    MERGE; on raw parquet the anti-join + append pair gives the same
    at-least-once-safe result as ES ``_op_type='create'``.)"""
    if os.path.exists(store_path):
        existing = read_store(spark, store_path).select(key)
        novel = df.join(existing, on=key, how="left_anti")
    else:
        novel = df
    novel = novel.cache()
    n = novel.count()
    if n:
        bulk_append(novel, store_path, partition_by)
    novel.unpersist()
    return n


class ConcurrentMergeError(RuntimeError):
    """Another merge holds the store's advisory lock."""


class _merge_lock:
    """Advisory single-merger lock for a parquet store: an O_EXCL
    lock file next to the store root, holder-stamped, with stale-lock
    takeover after ``stale_after_s`` (a crashed merger must not brick
    the store forever).

    LIMITATION (documented, by design): raw parquet has no transaction
    log, so this is writer-DISCIPLINE, not isolation — two mergers
    racing past a stale takeover are last-writer-wins at the partition
    level, and O_EXCL atomicity is only as good as the filesystem
    (true on POSIX/HDFS create-exclusive; on S3 use a real table
    format — Delta/Iceberg — for concurrent writers)."""

    def __init__(self, store_path: str, stale_after_s: float = 3600.0):
        self.path = store_path.rstrip("/") + ".merge.lock"
        self.stale_after_s = stale_after_s

    def __enter__(self):
        import time

        for attempt in (0, 1):
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, f"pid={os.getpid()} t={time.time()}".encode())
                os.close(fd)
                return self
            except FileExistsError:
                try:
                    age = time.time() - os.path.getmtime(self.path)
                except OSError:
                    continue  # holder released between open and stat — retry
                if age > self.stale_after_s and attempt == 0:
                    try:  # stale: crashed holder — take over
                        os.remove(self.path)
                    except OSError:
                        pass
                    continue
                try:
                    with open(self.path) as fh:
                        holder = fh.read(200)
                except OSError:
                    holder = "?"
                raise ConcurrentMergeError(
                    f"merge lock {self.path} held ({holder}); concurrent "
                    "merges into one store are not supported on raw parquet"
                ) from None
        raise ConcurrentMergeError(f"could not acquire merge lock {self.path}")

    def __exit__(self, *exc):
        try:
            os.remove(self.path)
        except OSError:
            pass
        return False


def merge_into_partitioned_store(
    spark: SparkSession,
    store_path: str,
    source: DataFrame,
    key_cols: tuple[str, ...],
    partition_by: tuple[str, ...] = ("source",),
    insert_only: bool = False,
    validate_partition_stability: bool = False,
    lock_stale_after_s: float = 3600.0,
) -> dict:
    """Partition-scoped copy-on-write MERGE into a partitioned parquet
    store — the 100 TB upsert story without a transaction log: only
    the partitions the ``source`` delta touches are read, merged
    (:func:`dss_nlp_ingestion_spark.operators.merge.merge_into`) and
    atomically swapped via Spark's DYNAMIC partition-overwrite mode;
    every other partition's files are never opened, let alone
    rewritten.  A delta touching 3 of 10,000 date partitions costs 3
    partition rewrites, not a table rewrite (the previous engine-level
    MERGE rewrote the full table — fine as a relational transform,
    wrong as a store write-path).  This is precisely the
    copy-on-write plan Delta/Iceberg MERGE lowers to, with the
    partition directory standing in for the file-level manifest.

    INVARIANT (same as Hive-style dynamic-partition upserts): the
    merge key must not move across partitions — a matched source row
    must carry its target row's partition values, else the stale copy
    in the old partition survives untouched.  Key-derived or
    immutable partition columns (source, ingest date) satisfy this by
    construction; ``validate_partition_stability=True`` verifies it
    with a key-join against the full store (a full shuffle — debug
    tool, not the scale path).

    Concurrency: the whole merge runs under :class:`_merge_lock` —
    a second concurrent merge raises :class:`ConcurrentMergeError`
    instead of silently interleaving partition overwrites (see the
    lock's documented limitation: discipline, not isolation).

    Returns {"rows_written", "partitions_touched"}.
    """
    with _merge_lock(store_path, lock_stale_after_s):
        return _merge_unlocked(
            spark,
            store_path,
            source,
            key_cols,
            partition_by,
            insert_only,
            validate_partition_stability,
        )


def _merge_unlocked(
    spark: SparkSession,
    store_path: str,
    source: DataFrame,
    key_cols: tuple[str, ...],
    partition_by: tuple[str, ...],
    insert_only: bool,
    validate_partition_stability: bool,
) -> dict:
    from dss_nlp_ingestion_spark.operators.merge import merge_into

    if not os.path.exists(store_path):
        src = source.cache()
        n = src.count()
        bulk_append(src, store_path, partition_by)
        parts = src.select(*partition_by).distinct().count()
        src.unpersist()
        return {"rows_written": n, "partitions_touched": parts}

    target = read_store(spark, store_path)
    part_rows = source.select(*partition_by).distinct().collect()
    # OR-of-ANDs over partition-column literals: evaluated against
    # directory values only (PartitionFilters), so untouched
    # partitions are pruned before a single data file is read.
    cond = F.lit(False)
    for row in part_rows:
        c = F.lit(True)
        for p in partition_by:
            c = c & (F.col(p) == F.lit(row[p]))
        cond = cond | c
    affected = target.filter(cond)

    if validate_partition_stability:
        moved = (
            target.select(*key_cols, *partition_by)
            .join(source.select(*key_cols, *partition_by), list(key_cols))
            .filter(
                ~F.concat_ws("\x00", *[target[p] for p in partition_by]).eqNullSafe(
                    F.concat_ws("\x00", *[source[p] for p in partition_by])
                )
            )
            .count()
        )
        if moved:
            raise ValueError(
                f"{moved} source rows move keys across partitions; "
                "partition-scoped MERGE requires stable partition values"
            )

    merged = merge_into(affected, source, key_cols, insert_only)
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(*partition_by).parquet(store_path)
    finally:
        if old_mode is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
    return {"rows_written": None, "partitions_touched": len(part_rows)}


def retention_delete(
    spark: SparkSession,
    store_path: str,
    time_col: str,
    older_than: str,
    partition_by: tuple[str, ...] = ("source",),
) -> int:
    """Retention job (SURVEY.md §2.12: ES ILM delete-phase analog —
    news @1088d, tweets @85d, elasticsearch_settings.md:26-59):
    drop rows with ``time_col < older_than`` by rewriting only the
    partitions that contain them. Returns rows deleted.

    On a transactional format this is ``DELETE WHERE``; on raw parquet
    the rewrite touches the affected partition directories only (a
    date-partitioned store at 100 TB prunes the rewrite to expired
    date partitions — newer partitions are never read)."""
    df = read_store(spark, store_path)
    cutoff = F.lit(older_than).cast("timestamp")
    expired = df.filter(F.col(time_col) < cutoff)
    n = expired.count()
    if n == 0:
        return 0
    kept = df.filter(~(F.col(time_col) < cutoff)).cache()
    kept.count()
    tmp = store_path.rstrip("/") + ".compact.tmp"
    kept.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    kept.unpersist()
    import shutil

    shutil.rmtree(store_path)
    os.rename(tmp, store_path)
    return n


def observed_append(
    df: DataFrame,
    store_path: str,
    partition_by: tuple[str, ...] = ("source",),
) -> dict:
    """K1 + A5: append with sink-side metrics via ``observe`` — the
    engine-native replacement for the reference's hand-rolled
    success/failure accounting (database_utils.py:96-107). Metrics are
    computed on the rows as written (one pass, no extra job)."""
    from pyspark.sql import Observation

    obs = Observation("sink_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("rows_written"),
        F.approx_count_distinct(F.concat_ws("/", *[F.col(c) for c in partition_by])).alias(
            "partitions_touched"
        ),
    )
    observed.write.mode("append").partitionBy(*partition_by).parquet(store_path)
    return obs.get


def date_partitioned_append(
    df: DataFrame,
    store_path: str,
    time_col: str = "time",
    source_col: str = "source",
) -> None:
    """The SURVEY §7.1 store layout: partitioned by (source, day) so
    time-window + per-collection queries prune both dimensions — at
    100 TB a 7-day lookback over one source reads 7 directories."""
    df.withColumn("_day", F.date_format(F.col(time_col), "yyyy-MM-dd")).write.mode(
        "append"
    ).partitionBy(source_col, "_day").parquet(store_path)


def compact_store(
    spark: SparkSession,
    store_path: str,
    partition_by: tuple[str, ...] = ("source",),
    target_files_per_partition: int = 1,
) -> int:
    """Maintenance compaction (the ES forcemerge / OPTIMIZE analog,
    SURVEY.md §4 "storage-side compaction"): rewrite the store with
    ``target_files_per_partition`` files per partition directory.
    Append-heavy ingestion accumulates small files; scan cost at
    100 TB tracks file count as much as byte count. Returns the file
    count after compaction."""
    df = read_store(spark, store_path).repartition(
        target_files_per_partition, *[F.col(c) for c in partition_by]
    )
    tmp = store_path.rstrip("/") + ".compact.tmp"
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(tmp)
    import shutil

    shutil.rmtree(store_path)
    os.rename(tmp, store_path)
    return len(read_store(spark, store_path).inputFiles())


def write_training_shards(
    packed: DataFrame,
    store_path: str,
    max_records_per_file: int | None = None,
) -> None:
    """Materialize a packed corpus (operators.sampling.pack_shards
    output joined back to its payload) as a shard_id-partitioned
    parquet store: each training shard becomes one directory, so a
    data loader reads exactly the shards it was assigned (partition
    pruning — no scan of the rest of the corpus) and shard boundaries
    survive recompaction. ``max_records_per_file`` caps file size for
    loaders that stream a shard in splits."""
    writer = packed.write.mode("overwrite").partitionBy("shard_id")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(store_path)
