"""Skew-mitigation demonstration for the benchmark harness.

Round-2 verdict ask #6: show, with numbers, that the engine's skew
guards hold wall-clock flat where the unguarded form degrades.  Two
demos, both on deterministic synthetic data generated JVM-side (no
fixture files, no RNG — hash-derived values so every run sees the
same data):

1. **Hot LSH bucket** (embedding near-dup family): a corpus where one
   hyperplane bucket holds ``n_hot`` near-identical vectors (planted:
   a fixed base vector plus sub-epsilon hash noise, so every hot
   vector shares one bucket).  Three arms, all counting the SAME
   510k-pair result:

   - ``bucket_unguarded_aqe_off_sec`` — plain bucket self-join as a
     sort-merge join with AQE disabled: the hot bucket's pairs land
     in ONE reducer (the degenerate 100 TB shape).
   - ``bucket_guarded_aqe_off_sec`` — ``bucketed_near_pairs(
     max_bucket=250)`` → ``skew.blocked_self_pairs``: identical pair
     space covered in cap^2-bounded blocks; no single reducer owns
     the hot bucket even with AQE off.
   - ``bucket_unguarded_aqe_on_sec`` — AQE skew-join splitting, the
     engine's default posture: Spark splits the hot partition at
     runtime.  Observed: AQE recovers part of the loss; the guard
     recovers more (AQE splits the sort-merge partition, but the
     guard also rebalances the pair GENERATION work).

   Outputs are asserted EQUAL across arms — guards change the
   schedule, never the answer.

2. **Hot join key** (``skew.salted_join``): a fact table where one
   key owns half the rows, joined to a non-broadcastable dim.  Arms:
   plain sort-merge join with AQE off (single hot reducer),
   ``salted_join`` with AQE off (manual fix), plain join with AQE on
   (Spark's runtime fix).  Row counts asserted equal.

Wall-clock is the honest proxy for p95 task time on a 32-thread
local box: the hot task IS the critical path, so its duration
dominates each arm's elapsed time.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.operators.similarity import bucketed_near_pairs
from dss_nlp_ingestion_spark.operators.skew import salted_join

DIM = 64


def _skewed_embeddings(
    spark: SparkSession, n_uniform: int, n_hot: int
) -> DataFrame:
    """Deterministic corpus with a planted hot hyperplane bucket.

    Hot vectors: fixed base ``((c*13) % 7) - 3`` (projections onto all
    8 demo hyperplanes are >= 3 in magnitude) plus 1e-3 hash noise
    (max projection perturbation ~0.2 — never flips a sign, so all
    hot vectors share one bucket while every vector stays distinct).
    Uniform vectors: hash-derived pseudo-random, spreading over all
    2^8 buckets.
    """
    i = F.sequence(F.lit(1), F.lit(DIM))
    base = spark.range(n_uniform + n_hot).select(
        F.col("id").alias("vec_id"),
        (F.col("id") < n_hot).alias("_hot"),
    )

    def frac_hash(c):
        return (
            F.pmod(F.xxhash64(F.col("vec_id"), c), F.lit(1000)).cast("double")
            / 500.0
            - 1.0
        )

    hot_vec = F.transform(
        i, lambda c: (((c * 13) % 7) - 3).cast("double") + 0.001 * frac_hash(c)
    )
    uni_vec = F.transform(i, lambda c: frac_hash(c))
    return base.select(
        "vec_id",
        F.when(F.col("_hot"), hot_vec).otherwise(uni_vec).alias("embedding"),
    )


def _timed_count(df: DataFrame) -> tuple[float, int]:
    t0 = time.perf_counter()
    n = df.count()
    return round(time.perf_counter() - t0, 3), n


def _with_conf(spark: SparkSession, conf: dict, thunk):
    old = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    try:
        return thunk()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def run_skew_demo(
    spark: SparkSession,
    n_uniform: int = 10_000,
    n_hot: int = 1_000,
    fact_rows: int = 20_000_000,
    dim_keys: int = 200_000,
) -> dict:
    """Run both skew demos; returns a flat dict for the bench JSON."""
    no_bcast = {"spark.sql.autoBroadcastJoinThreshold": "-1"}
    aqe_off = dict(no_bcast, **{"spark.sql.adaptive.enabled": "false"})
    out: dict[str, float | int] = {
        "hot_bucket_rows": n_hot,
        "corpus_rows": n_uniform + n_hot,
    }

    emb = _skewed_embeddings(spark, n_uniform, n_hot).persist()
    emb.count()
    pairs = lambda cap: bucketed_near_pairs(emb, threshold=0.35, max_bucket=cap)  # noqa: E731
    t_off, n_off = _with_conf(spark, aqe_off, lambda: _timed_count(pairs(None)))
    t_gua, n_gua = _with_conf(spark, aqe_off, lambda: _timed_count(pairs(250)))
    t_aqe, n_aqe = _with_conf(spark, no_bcast, lambda: _timed_count(pairs(None)))
    emb.unpersist()
    assert n_off == n_gua == n_aqe, (
        f"skew guard changed the answer: {n_off}/{n_gua}/{n_aqe}"
    )
    out.update(
        pairs=n_gua,
        bucket_unguarded_aqe_off_sec=t_off,
        bucket_guarded_aqe_off_sec=t_gua,
        bucket_unguarded_aqe_on_sec=t_aqe,
        bucket_guard_speedup=round(t_off / max(t_gua, 1e-9), 2),
    )

    # --- hot join key: half the fact rows share key 0 ---------------
    fact = spark.range(fact_rows).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(dim_keys)))
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(dim_keys).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim_val")
    )
    t_plain_off, n_plain = _with_conf(
        spark, aqe_off, lambda: _timed_count(fact.join(dim, "k"))
    )
    t_salted_off, n_salted = _with_conf(
        spark,
        aqe_off,
        lambda: _timed_count(
            salted_join(fact, dim, "k", salt_buckets=32, fact_salt_source="fact_id")
        ),
    )
    t_plain_aqe, n_aqe_j = _with_conf(
        spark, no_bcast, lambda: _timed_count(fact.join(dim, "k"))
    )
    assert n_plain == n_salted == n_aqe_j, (
        f"join arms disagree: {n_plain}/{n_salted}/{n_aqe_j}"
    )
    out.update(
        fact_rows=fact_rows,
        join_plain_aqe_off_sec=t_plain_off,
        join_salted_aqe_off_sec=t_salted_off,
        join_plain_aqe_on_sec=t_plain_aqe,
        join_salted_speedup=round(t_plain_off / max(t_salted_off, 1e-9), 2),
    )
    return out
