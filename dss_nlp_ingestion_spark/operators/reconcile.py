"""Table reconciliation: Merkle-style bucket digests for comparing
two stores WITHOUT shipping either one — the anti-entropy primitive
behind migration validation, replica verification, and backfill
audits.

Why it matters at 100 TB: "did the copy land exactly?" cannot be a
row-by-row join of two 100 TB tables (a full shuffle of both). With
bucket digests each side independently reduces to ``n_buckets`` rows
(one shuffle each, map-side partials), and only the digests cross the
network. Differing buckets — usually none or a handful — are then
re-read selectively for row-level diffing, so the total cost is two
scans + O(drifted data), not O(table) transfer.

Digest design (cross-engine determinism, registry.py rules):
- per-row digest = sha256 of a caller-prepared STRING (the caller
  controls value rendering — doubles via DECIMAL casts, timestamps
  via epoch_ms — because raw float/timestamp-to-string casts differ
  between engines);
- per-bucket digest = sha256 over the CONCATENATION OF SORTED row
  digests (hex is ASCII, so Spark's array_sort and any engine's
  binary-collation ORDER BY agree) — order-independent by
  construction, which partial aggregation at scale requires;
- bucket id = key % n_buckets from a caller-chosen integer key.
  Pick ``n_buckets`` so buckets stay collect_list-sized (~thousands
  of rows); at 100 TB that means millions of buckets, still a
  trivially small digest table.

Reference parity: the reference's replicate-if-absent sink
(src/base.py:282-301) copies Mongo -> ES with no verification story;
this closes that gap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def table_bucket_digests(
    df: DataFrame,
    bucket_key: Column,
    row_repr: Column,
    n_buckets: int = 64,
) -> DataFrame:
    """(bucket, n_rows, digest): one row per bucket. ``bucket_key``
    must be a non-negative integer column; ``row_repr`` the
    deterministic string rendering of the row."""
    return (
        df.select(
            F.pmod(bucket_key, F.lit(n_buckets)).cast("long").alias("bucket"),
            F.sha2(row_repr, 256).alias("_d"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sha2(F.concat_ws("", F.array_sort(F.collect_list("_d"))), 256).alias(
                "digest"
            ),
        )
    )


def diff_buckets(a: DataFrame, b: DataFrame) -> DataFrame:
    """Full-outer compare of two digest tables: one row per bucket
    present in either side, with both counts and a match flag. The
    join is n_buckets-sized — broadcastable at any table size."""
    aa = a.select(
        "bucket",
        F.col("n_rows").alias("n_a"),
        F.col("digest").alias("_da"),
    )
    bb = b.select(
        "bucket",
        F.col("n_rows").alias("n_b"),
        F.col("digest").alias("_db"),
    )
    return aa.join(bb, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        (
            F.col("_da").isNotNull()
            & F.col("_db").isNotNull()
            & (F.col("_da") == F.col("_db"))
        ).alias("match"),
    )
